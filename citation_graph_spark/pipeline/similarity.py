"""Similarity search over an embedding column (``array<float>``).

- ``ann_topk_bruteforce`` — exact cosine top-k per query: cross join
  queries × corpus (queries side broadcast — it is the small side by
  construction), built-in array arithmetic for the cosine, per-query top-k
  via ``row_number`` window partitioned by query id. The correctness
  baseline; O(|Q|·|C|).
- ``ann_lsh_topk`` — random-hyperplane LSH: sign-bit signature from
  deterministic hash-derived hyperplanes, candidates = same bucket in ≥1 of
  ``tables`` signatures, exact cosine re-rank of candidates. The scale
  path: the corpus is hashed once (linear), each query probes its buckets
  instead of the full corpus. Recall < 1 by design; the top-k re-rank is
  exact over candidates.

Hyperplanes are pseudo-random but fully deterministic: a fixed-seed
``numpy`` Philox generator keyed only by (seed, table) — no shared RNG
state, so driver, executors, and reruns agree exactly. The signature step
is a single Arrow-batched pandas UDF (one matrix multiply per batch);
everything around it is built-in expressions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F, types as T

from citation_graph_spark.caching import release_on_gc
from citation_graph_spark.pipeline.dedup import cosine_sim


def ann_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scorer: str = "gemv",
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank) — EXACT top-k by cosine,
    deterministic tie-break on neighbor id. Self-matches excluded.

    ``scorer='gemv'`` (default): the query matrix is collected/broadcast
    (queries are the small side by contract) and each Arrow batch of the
    corpus is scored with ONE numpy matrix multiply, keeping only the
    per-batch top-k per query — the shuffle then carries
    |Q|·k·n_batches rows instead of |Q|·|C|. Per-batch top-k under the
    global ordering (cosine desc, id asc) is lossless for global top-k.

    ``scorer='sql'``: pure built-in expressions (broadcast join +
    ``aggregate``/``zip_with`` cosine) — slower, zero Python; kept as the
    formulation mirror of the DuckDB oracle. Non-integral id columns
    (strings, …) fall back to this path automatically: the GEMV scorer
    packs ids into an int64 ndarray."""
    id_type = corpus.schema[id_col].dataType
    if scorer == "gemv" and not isinstance(
        id_type, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
    ):
        scorer = "sql"
    if scorer == "sql":
        q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
        scored = (
            F.broadcast(q)
            .join(c, F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id",
                "neighbor_id",
                F.round(
                    cosine_sim(
                        F.col("qv").cast("array<double>"),
                        F.col("cv").cast("array<double>"),
                    ),
                    6,
                ).alias("cosine"),
            )
        )
    elif scorer == "gemv":
        # output ids keep the input id type (int64 math internally; any
        # integral input round-trips exactly — Arrow down-casts on write)
        id_sql = id_type.simpleString()
        q_rows = queries.select(id_col, vec_col).collect()
        if not q_rows:
            return queries.sparkSession.createDataFrame(
                [], f"query_id {id_sql}, neighbor_id {id_sql}, cosine double, rank int"
            )
        qids = np.array([r[id_col] for r in q_rows], dtype="int64")
        qmat = np.stack([np.asarray(r[vec_col], dtype="float64") for r in q_rows])
        qnorm = np.linalg.norm(qmat, axis=1)
        qunit = np.divide(
            qmat, qnorm[:, None], out=np.zeros_like(qmat), where=qnorm[:, None] > 0
        )

        def score(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                nids = pdf[id_col].to_numpy()
                cmat = np.stack(pdf[vec_col].to_numpy()).astype("float64")
                cnorm = np.linalg.norm(cmat, axis=1)
                cunit = np.divide(
                    cmat, cnorm[:, None], out=np.zeros_like(cmat), where=cnorm[:, None] > 0
                )
                # round BEFORE selecting: the final rank is over the rounded
                # cosine, so ties created by rounding must be broken by id
                # here too, or a batch could keep the wrong candidate
                sims = np.round(cunit @ qunit.T, 6)  # (n_c, n_q)
                for j in range(len(qids)):
                    mask = nids != qids[j]
                    cand_ids = nids[mask]
                    cand_sims = sims[mask, j]
                    if len(cand_ids) == 0:
                        continue
                    top = min(k, len(cand_ids))
                    # order: cosine desc, neighbor id asc — lexsort keys
                    order = np.lexsort((cand_ids, -cand_sims))[:top]
                    yield pd.DataFrame(
                        {
                            "query_id": qids[j],
                            "neighbor_id": cand_ids[order],
                            "cosine": cand_sims[order],
                        }
                    )

        scored = corpus.mapInPandas(
            score, f"query_id {id_sql}, neighbor_id {id_sql}, cosine double"
        )
    else:
        raise ValueError(f"unknown scorer {scorer!r}")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_cosine_pairs_lsh(
    emb: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    tables: int = 4,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    buckets_out: str | None = None,
) -> DataFrame:
    """(id_a, id_b, cosine) near-dup pairs at scale — the LSH counterpart
    of ``dedup.embedding_cosine_pairs`` (which is the exact O(n²) baseline).

    The corpus is hashed once into ``tables`` sign-bit buckets; candidates
    = pairs sharing a bucket in ≥1 table; exact cosine verify over the
    candidates only. Recall < 1 by design (a pair landing in different
    buckets in every table is missed); every emitted cosine is exact.

    ``buckets_out``: optional parquet path for the ``(id, tbl, bucket)``
    assignment table — a durable bucket store (hash the corpus once, keep
    the buckets; an external checker reproduces candidate-join + verify
    from it, since the signature UDF is deterministic per vector).

    Lazy result; the hash-once bucket cache is released on result GC
    (see caching.py)."""
    sig_udf = make_lsh_signatures_udf(dim, tables, planes)
    # persist = the hash-once contract: the self-join below would otherwise
    # run the signature UDF over the corpus twice. r06 note: an ids-only
    # bucket table + vector re-attach joins (guide §8) measured slower at
    # bench scale (see ann_lsh_topk); kept the vector-carrying shape.
    bucketed = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.posexplode(sig_udf(F.col(vec_col))).alias("tbl", "bucket"),
    ).persist()
    bucketed.count()  # eager hash-once (see dedup.minhash_lsh_pairs, r06)
    if buckets_out is not None:
        bucketed.select("id", "tbl", "bucket").write.mode("overwrite").parquet(
            buckets_out
        )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("a.v").alias("va"),
            F.col("b.id").alias("id_b"),
            F.col("b.v").alias("vb"),
        )
        .distinct()
    )
    cos = cosine_sim(
        F.col("va").cast("array<double>"), F.col("vb").cast("array<double>")
    )
    return release_on_gc(
        candidates.select("id_a", "id_b", F.round(cos, 6).alias("cosine")).where(
            F.col("cosine") >= threshold
        ),
        bucketed,
    )


def _nearest_cells_udf(cents: "np.ndarray", probe: int, dim: int):
    """pandas UDF: embedding → the ``probe`` nearest centroid indices by
    cosine (one GEMV per Arrow batch against the broadcast-captured
    centroid matrix)."""

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def nearest_cells(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy())[:, :dim].astype("float64")
        norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = (mat / norms) @ cents.T
        top = np.argsort(-sims, axis=1)[:, :probe].astype("int32")
        return pd.Series(list(top))

    return nearest_cells


def _lloyd_refine(
    train: DataFrame, cents: "np.ndarray", iters: int, dim: int, vec_col: str
) -> "np.ndarray":
    """Spherical k-means refinement of the centroid matrix, distributed.

    Each iteration: assign every training vector to its nearest centroid
    (GEMV pandas UDF), compute per-cell component sums as ``dim``
    ``sum(element_at(vec, p))`` aggregate columns (|cells| rows collected
    — tiny), renormalize; empty cells keep their previous centroid.
    Everything is one UDF pass + one built-in aggregation per iteration —
    no driver-side loops over vectors.

    r06: the previous posexplode + groupBy(cell, pos) shape multiplied
    the aggregation input ``dim``× and measured ~0.86 s/iteration at the
    bench corpus; the element_at aggregation measures ~0.55 s with
    BIT-IDENTICAL per-(cell, pos) sums (both accumulate the same values
    in the same partition-row order — verified exactly in the A/B)."""
    for _ in range(iters):
        assign_udf = _nearest_cells_udf(cents, 1, dim)
        vec = F.col(vec_col).cast("array<double>")
        comps = (
            train.select(
                F.element_at(assign_udf(F.col(vec_col)), 1).alias("cell"),
                vec.alias("_v"),
            )
            .groupBy("cell")
            .agg(
                *[
                    F.sum(F.element_at("_v", p + 1)).alias(f"s{p}")
                    for p in range(dim)
                ],
                F.count("*").alias("c"),
            )
            .collect()
        )
        new = cents.copy()
        sums = np.zeros_like(cents)
        counts = np.zeros(len(cents))
        for r in comps:
            counts[r["cell"]] = r["c"]
            for p in range(dim):
                sums[r["cell"], p] = r[f"s{p}"]
        nonempty = counts > 0
        means = sums[nonempty] / counts[nonempty, None]
        norms = np.maximum(np.linalg.norm(means, axis=1, keepdims=True), 1e-12)
        new[nonempty] = means / norms
        cents = new
    return cents


def ann_ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_iters: int = 3,
    n_assign: int = 1,
    train_fraction: float = 1.0,
    cells_out: str | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank) — IVF (inverted-file) ANN.

    Coarse quantizer: ``n_centroids`` seed centroids taken as a
    deterministic hash-ordered sample of the corpus (data-dependent, no
    RNG state, reproducible across runs/executors), then refined with
    ``lloyd_iters`` spherical k-means iterations run distributed (assign
    via GEMV pandas UDF → per-cell mean via built-in aggregation →
    renormalize). Every corpus vector is assigned to its nearest centroid
    (the inverted file, built once); queries probe their ``n_probe``
    nearest cells and re-rank candidates with exact cosine. Recall < 1 by
    design; emitted cosines are exact.

    ``n_assign``: index each corpus vector in its ``n_assign`` nearest
    cells (multi-assignment / replicated inverted file). On
    near-isotropic embeddings — where a true neighbor frequently sits
    just across a Voronoi boundary — this buys far more recall per
    scanned candidate than raising ``n_probe`` alone (measured knee on
    the bench corpus: 64 centroids, probe 16, assign 2 → recall@10 0.86
    at 0.43 candidate fraction; see BENCH.md grid). Index size scales by
    ``n_assign``; query-side work scales with candidates, as always.

    ``train_fraction``: deterministic hash-sampled subset used for Lloyd
    training (at 100 TB you train the 2¹⁰-centroid quantizer on ~10⁻⁶ of
    the corpus — a scan-side filter, never a sort).

    ``cells_out``: optional parquet root; writes ``{cells_out}/corpus``
    and ``{cells_out}/queries`` as ``(id, cells array<int>)`` — the
    durable inverted file + probe lists, from which an external checker
    reproduces the probe-join + re-rank exactly.

    vs ``ann_lsh_topk``: IVF cells adapt to the data distribution (good
    for clustered embeddings); LSH is data-oblivious (good when the
    corpus distribution drifts). Both are linear-scan-free at scale."""
    import numpy as np

    sample = (
        corpus.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("i").cast("string"), F.lit(seed)))
        .limit(n_centroids)
        .collect()
    )
    cents = np.stack([np.asarray(r["v"][:dim], dtype="float64") for r in sample])
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    if lloyd_iters > 0:
        train = corpus
        if train_fraction < 1.0:
            bound = int(train_fraction * 1_000_000)
            train = corpus.where(
                F.pmod(
                    F.xxhash64(F.col(id_col).cast("string"), F.lit(seed + 1)),
                    F.lit(1_000_000),
                )
                < bound
            )
        cents = _lloyd_refine(train, cents, lloyd_iters, dim, vec_col)
    probe = min(n_probe, len(cents))
    assign = min(n_assign, len(cents))
    depth = max(probe, assign)

    # r06 note: an ids-only probe join + distinct with vector re-attach
    # joins (guide §8) was built and measured slower at the bench corpus
    # (see ann_lsh_topk — same pattern, same verdict); the vector-carrying
    # shape is kept as the measured-faster local form, ids-only wins when
    # candidates >> corpus.
    nearest_cells = _nearest_cells_udf(cents, depth, dim)
    corpus_cells = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        nearest_cells(F.col(vec_col)).alias("cells"),
    )
    query_cells = queries.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        nearest_cells(F.col(vec_col)).alias("cells"),
    )
    release = ()
    if cells_out is not None:
        # hash once: the store writes and the probe join share one UDF pass
        corpus_cells = corpus_cells.persist()
        query_cells = query_cells.persist()
        release = (corpus_cells, query_cells)
        corpus_cells.select("id", "cells").write.mode("overwrite").parquet(
            cells_out + "/corpus"
        )
        query_cells.select("id", "cells").write.mode("overwrite").parquet(
            cells_out + "/queries"
        )
    inverted = corpus_cells.select(
        F.col("id").alias("neighbor_id"),
        F.col("v").alias("neighbor_id_v"),
        F.explode(F.slice("cells", 1, assign)).alias("cell"),
    )
    probes = query_cells.select(
        F.col("id").alias("query_id"),
        F.col("v").alias("query_id_v"),
        F.explode(F.slice("cells", 1, probe)).alias("cell"),
    )
    candidates = (
        probes.join(inverted, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "query_id_v", "neighbor_id", "neighbor_id_v")
        .distinct()
    )
    scored = candidates.select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine_sim(
                F.col("query_id_v").cast("array<double>"),
                F.col("neighbor_id_v").cast("array<double>"),
            ),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return release_on_gc(
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank"),
        *release,
    )


def _hyperplanes(dim: int, tables: int, planes: int, seed: int = 42) -> np.ndarray:
    """(tables, planes, dim) float64 — deterministic per (seed, table)."""
    out = np.empty((tables, planes, dim))
    for t in range(tables):
        gen = np.random.Generator(np.random.Philox(key=seed * 1_000_003 + t))
        out[t] = gen.standard_normal((planes, dim))
    return out


def make_lsh_signatures_udf(dim: int, tables: int, planes: int, seed: int = 42):
    """pandas UDF: array<float> embedding → array<int> of per-table bucket
    ids (sign bits of hyperplane dot products, packed). One matrix multiply
    per Arrow batch — the per-row cost is a dim×(tables·planes) GEMV."""
    hp = _hyperplanes(dim, tables, planes, seed).reshape(tables * planes, dim)
    weights = (2 ** np.arange(planes - 1, -1, -1)).astype(np.int64)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def lsh_signatures(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy())[:, :dim].astype(np.float64)
        bits = (mat @ hp.T >= 0).reshape(len(mat), tables, planes)
        buckets = (bits * weights).sum(axis=2).astype("int32")
        return pd.Series(list(buckets))

    return lsh_signatures


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    dim: int = 64,
    tables: int = 4,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    buckets_out: str | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank) — approximate top-k.

    Corpus hashed once into ``tables`` bucket columns (exploded to rows,
    partitioned by (table, bucket)); queries probe the matching buckets;
    exact cosine + window top-k over the candidate union.

    ``buckets_out``: optional parquet path for the corpus ``(id, tbl,
    bucket)`` assignment table — the durable inverted index of the scale
    deployment (hash the corpus once, keep the buckets; queries probe the
    store). The signature UDF is deterministic per vector, so the store
    is exactly what the probe join matches against."""
    sig_udf = make_lsh_signatures_udf(dim, tables, planes)

    # r06 note: an ids-only candidate distinct with per-candidate vector
    # re-attach joins (guide §8) was built and MEASURED SLOWER at the
    # bench corpus (interleaved min 2.48 s vs 1.83 s): at |C|=2000 the
    # two extra broadcast joins cost more fixed stage latency than the
    # ~1 KB/row distinct saves. At 100 TB (candidates >> corpus) the
    # ids-only shape wins; see OPTIMIZATION_r06.md for both numbers.
    def bucketize(df: DataFrame, out_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(out_id + "_v"),
            F.posexplode(sig_udf(F.col(vec_col))).alias("tbl", "bucket"),
        )

    cq = bucketize(queries, "query_id")
    cc = bucketize(corpus, "neighbor_id")
    release = ()
    if buckets_out is not None:
        # hash once: the store write and the probe join share one UDF pass
        cc = cc.persist()
        release = (cc,)
        cc.select(
            F.col("neighbor_id").alias("id"), "tbl", "bucket"
        ).write.mode("overwrite").parquet(buckets_out)
    candidates = (
        cq.join(cc, ["tbl", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "query_id_v", "neighbor_id", "neighbor_id_v")
        .distinct()
    )
    scored = candidates.select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine_sim(
                F.col("query_id_v").cast("array<double>"),
                F.col("neighbor_id_v").cast("array<double>"),
            ),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return release_on_gc(
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank"),
        *release,
    )
