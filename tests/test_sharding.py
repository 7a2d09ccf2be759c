"""Deterministic split + token packing + near-dup clustering."""

import hashlib

import pyspark.sql.functions as F

from citation_graph_spark.pipeline.dedup import duplicate_clusters
from citation_graph_spark.pipeline.sharding import (
    deterministic_split,
    pack_token_bins,
    split_thresholds,
)


def _py_split(key, salt, weights):
    bucket = hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:8]
    for name, bound in split_thresholds(weights)[:-1]:
        if bucket < bound:
            return name
    return list(weights)[-1]


def test_deterministic_split_matches_python_oracle(spark):
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    docs = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    got = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(docs, weights).collect()
    }
    for i in range(2000):
        assert got[i] == _py_split(i, "split", weights), i
    # ratios in the right ballpark (md5 is uniform)
    n_train = sum(1 for v in got.values() if v == "train")
    assert 0.75 < n_train / 2000 < 0.85
    # growth-stable: a larger corpus never reassigns existing keys
    bigger = deterministic_split(
        spark.range(0, 4000).select(F.col("id").alias("doc_id")), weights
    )
    again = {r["doc_id"]: r["split"] for r in bigger.collect()}
    assert all(again[i] == got[i] for i in range(2000))


def test_pack_token_bins_matches_python(spark):
    rows = [(i, "tok " * (5 + (i * 7) % 40)) for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    budget = 100
    got = {
        r["doc_id"]: (r["n_tokens"], r["bin_id"])
        for r in pack_token_bins(docs, budget_tokens=budget).collect()
    }
    cum = 0
    for i, text in rows:
        n = len(text.split())
        assert got[i] == (n, cum // budget), i
        cum += n
    # every bin except possibly the last is nearly full: a bin can fall
    # short of the budget only by less than one document (the previous
    # bin's last document may overshoot the boundary, shifting this bin's
    # start into its own window)
    by_bin = {}
    for i, (n, b) in got.items():
        by_bin[b] = by_bin.get(b, 0) + n
    max_n = max(n for n, _ in got.values())
    for b in sorted(by_bin)[:-1]:
        assert by_bin[b] > budget - max_n


def test_duplicate_clusters_transitive(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog again and again today"),
            (1, "the quick brown fox jumps over the lazy dog again and again tomorrow"),
            (3, "the quick brown fox jumps over the lazy dog again and again today"),
            (7, "completely different content with no overlap whatsoever here"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(docs, n=3, threshold=0.5).collect()
    }
    # 0≈1 (near), 0==3 (exact) → one transitive family labeled by min id;
    # 7 is its own singleton cluster
    assert got == {0: 0, 1: 0, 3: 0, 7: 7}


def test_duplicate_clusters_accepts_precomputed_pairs(spark):
    docs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (5, "c"), (9, "d")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 5)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(docs, pairs=pairs).collect()
    }
    assert got == {1: 1, 2: 1, 5: 1, 9: 9}


def test_pack_token_bins_scalable_matches_window_version(spark):
    from citation_graph_spark.pipeline.sharding import pack_token_bins_scalable

    rows = [(i * 3 + 1, "w " * (3 + (i * 11) % 60)) for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(7)
    window_out = {
        r["doc_id"]: (r["n_tokens"], r["bin_id"])
        for r in pack_token_bins(docs, budget_tokens=256).collect()
    }
    scalable_out = {
        r["doc_id"]: (r["n_tokens"], r["bin_id"])
        for r in pack_token_bins_scalable(docs, budget_tokens=256).collect()
    }
    assert scalable_out == window_out
    # schema parity too (the driver's value hash is type-sensitive)
    a = dict(pack_token_bins(docs, budget_tokens=256).dtypes)
    b = dict(pack_token_bins_scalable(docs, budget_tokens=256).dtypes)
    assert a == b
