import hashlib
import math
import re

import numpy as np
import pytest
import pyspark.sql.functions as F

from citation_graph_spark.pipeline.dedup import (
    embedding_cosine_pairs,
    exact_dedup,
    exact_dup_groups,
    exact_jaccard_for_candidates,
    minhash_band_bucket_sizes,
    minhash_lsh_candidates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash64,
    simhash_chunk_bucket_sizes,
    simhash_pairs,
)
from citation_graph_spark.pipeline.multimodal import (
    decode_features,
    frame_sample_plan,
    synth_media,
)
from citation_graph_spark.pipeline.similarity import (
    ann_ivf_topk,
    ann_lsh_topk,
    ann_topk_bruteforce,
    embedding_cosine_pairs_lsh,
)
from citation_graph_spark.pipeline.text import document_profile


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again today"),
    (1, "the quick brown fox jumps over the lazy dog again and again tomorrow"),
    (2, "completely different content with no overlap whatsoever here"),
    (3, "the quick brown fox jumps over the lazy dog again and again today"),  # dup of 0
    (4, ""),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_tokens(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _py_shingles(text, n=5):
    toks = _py_tokens(text)
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_document_profile(spark):
    prof = {r["doc_id"]: r for r in document_profile(_docs(spark)).collect()}
    assert prof[0]["n_tokens"] == len(_py_tokens(DOCS[0][1]))
    assert prof[4]["n_tokens"] == 0 and prof[4]["quality"] == 0.0
    norm = re.sub(r"\s+", " ", DOCS[0][1].lower()).strip()
    assert prof[0]["fingerprint"] == hashlib.md5(norm.encode()).hexdigest()
    assert prof[0]["lang_pred"] == "en"
    assert 0.0 <= prof[1]["quality"] <= 1.0


def test_exact_dedup(spark):
    kept = sorted(r["doc_id"] for r in exact_dedup(_docs(spark)).collect())
    assert kept == [0, 1, 2, 4]  # 3 deduped into 0
    groups = exact_dup_groups(_docs(spark)).collect()
    assert len(groups) == 1 and groups[0]["n_docs"] == 2 and groups[0]["min_doc_id"] == 0


def test_ngram_jaccard_matches_python(spark):
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(_docs(spark), n=5, threshold=0.0).collect()
    }
    # python oracle over all pairs
    exp = {}
    for i, (ia, ta) in enumerate(DOCS):
        for ib, tb in DOCS[i + 1 :]:
            sa, sb = _py_shingles(ta), _py_shingles(tb)
            inter = len(sa & sb)
            if inter:
                exp[(ia, ib)] = round(inter / (len(sa | sb)), 6)
    assert got == exp
    assert got[(0, 3)] == 1.0  # exact dup
    assert 0 < got[(0, 1)] < 1.0  # near dup


def test_minhash_lsh_finds_near_dups(spark):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(_docs(spark), threshold=0.5).collect()
    }
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0
    assert (0, 1) in pairs  # high-jaccard near dup caught by banding
    assert all(j >= 0.5 for j in pairs.values())
    assert not any({a, b} & {2, 4} for a, b in pairs)


def _stop_shingle_corpus(spark):
    """30 docs all sharing one stop 3-gram ('common filler words'); docs 0/1
    are a planted near-dup pair whose overlap lives in RARE shingles."""
    rows = [
        (0, "common filler words aaa bbb ccc ddd eee today"),
        (1, "common filler words aaa bbb ccc ddd eee tomorrow"),
    ]
    for i in range(2, 30):
        rows.append((i, f"common filler words u{i} v{i} w{i} x{i}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_verify_restricted_to_candidates(spark):
    """minhash_lsh_pairs == {LSH candidates} ∩ {exact pairs}, with exact
    jaccard values — and the verify input (candidates) is far smaller than
    the shared-shingle pair blow-up a stop shingle causes."""
    docs = _stop_shingle_corpus(spark)
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_candidates(docs, n=3).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, n=3, threshold=0.3).collect()
    }
    assert got == {p: j for p, j in exact.items() if p in cand}
    assert (0, 1) in got and got[(0, 1)] == exact[(0, 1)]
    # the stop shingle makes every pair share ≥1 shingle: C(30,2) blocked
    # pairs; LSH candidates must be a small fraction of that
    shared = ngram_jaccard_pairs(docs, n=3, threshold=0.0).count()
    assert shared == 30 * 29 // 2
    assert len(cand) < shared / 10


def test_exact_jaccard_for_candidates_matches_python(spark):
    docs = _docs(spark)
    sh = shingles(docs, n=5)
    cand = spark.createDataFrame(
        [(0, 1), (0, 3), (0, 2), (1, 3)], "doc_a long, doc_b long"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in exact_jaccard_for_candidates(cand, sh).collect()
    }
    exp = {}
    for a, b in [(0, 1), (0, 3), (0, 2), (1, 3)]:
        sa, sb = _py_shingles(DOCS[a][1]), _py_shingles(DOCS[b][1])
        if sa & sb:
            exp[(a, b)] = round(len(sa & sb) / len(sa | sb), 6)
    assert got == exp
    assert (0, 2) not in got  # empty intersection drops out


def test_ngram_max_df_cap(spark):
    """DF-capped blocking: output pairs carry the EXACT full-set jaccard
    (high-DF shingles still count in |∩|/|∪|); pairs linked only through
    stop shingles are the (documented) recall loss."""
    docs = _stop_shingle_corpus(spark)
    uncapped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.0).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.0, max_df=5).collect()
    }
    # capped ⊆ uncapped with identical values (full-set jaccard, not
    # rare-shingle-only jaccard)
    assert capped and all(uncapped[p] == j for p, j in capped.items())
    assert (0, 1) in capped
    # at a real threshold the stop-shingle-only pairs are below it anyway:
    # capped and uncapped agree exactly
    unc_t = {p: j for p, j in uncapped.items() if j >= 0.3}
    cap_t = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.3, max_df=5).collect()
    }
    assert cap_t == unc_t


def test_simhash(spark):
    sims = {r["doc_id"]: r["simhash"] for r in simhash64(_docs(spark)).collect()}
    assert sims[0] == sims[3]  # identical text, identical hash
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(_docs(spark), max_hamming=3).collect()
    }
    assert pairs[(0, 3)] == 0


def _emb(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 16).astype("float32")
    vecs[5] = vecs[2] + 0.001  # planted near-dup
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(20)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        vecs.astype("float64"),
    )


def _py_topk(vecs, qi, k):
    sims = []
    for j in range(len(vecs)):
        if j == qi:
            continue
        c = vecs[qi] @ vecs[j] / (np.linalg.norm(vecs[qi]) * np.linalg.norm(vecs[j]))
        sims.append((round(c, 6), j))
    sims.sort(key=lambda t: (-t[0], t[1]))
    return sims[:k]


def test_embedding_cosine_pairs(spark):
    emb, vecs = _emb(spark)
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_cosine_pairs(emb, threshold=0.99).collect()
    }
    assert (2, 5) in got and got[(2, 5)] > 0.999


def test_ann_bruteforce_matches_numpy(spark):
    emb, vecs = _emb(spark)
    got = ann_topk_bruteforce(emb, emb, k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["cosine"]))
    for qi in range(20):
        exp = _py_topk(vecs, qi, 3)
        rows = sorted(by_q[qi])
        for (rank, nid, cos), (ecos, ej) in zip(rows, exp):
            assert nid == ej, (qi, rank)
            assert math.isclose(cos, ecos, abs_tol=2e-6)


def test_embed_cosine_lsh_pairs(spark):
    emb, _ = _emb(spark)
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_cosine_pairs(emb, threshold=0.5).collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_cosine_pairs_lsh(
            emb, threshold=0.5, dim=16, tables=4, planes=6
        ).collect()
    }
    # every emitted pair is exact (subset of brute force, identical cosine)
    assert all(exact.get(p) == c for p, c in got.items())
    assert (2, 5) in got and got[(2, 5)] > 0.999  # planted near-dup recalled


def test_ann_lsh_recalls_planted_pair(spark):
    emb, _ = _emb(spark)
    got = ann_lsh_topk(emb, emb, k=3, dim=16, tables=4, planes=6).collect()
    top1 = {r["query_id"]: r["neighbor_id"] for r in got if r["rank"] == 1}
    assert top1.get(2) == 5 and top1.get(5) == 2  # near-identical pair found


def test_ann_ivf_recalls_planted_pair(spark):
    emb, vecs = _emb(spark)
    got = ann_ivf_topk(emb, emb, k=3, dim=16, n_centroids=4, n_probe=2).collect()
    top1 = {r["query_id"]: r["neighbor_id"] for r in got if r["rank"] == 1}
    # near-identical vectors land in the same cell → recalled both ways
    assert top1.get(2) == 5 and top1.get(5) == 2
    # every emitted cosine is exact (matches the brute-force computation)
    brute = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in ann_topk_bruteforce(emb, emb, k=19).collect()
    }
    for r in got:
        assert brute[(r["query_id"], r["neighbor_id"])] == r["cosine"]
    # deterministic across runs (hash-ordered centroid sample, no RNG state)
    again = ann_ivf_topk(emb, emb, k=3, dim=16, n_centroids=4, n_probe=2).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_multimodal_fake_decode(spark):
    media = synth_media(spark, 30)
    assert media.count() == 30
    feats = decode_features(media, fake_decoder=True).collect()
    assert len(feats) == 30
    by_id = {r["media_id"]: r for r in feats}
    assert len(by_id[0]["feat"]) == 8
    assert all(0.0 <= v <= 1.0 for v in by_id[0]["feat"])
    # deterministic across runs
    feats2 = {r["media_id"]: r["feat"] for r in decode_features(media, fake_decoder=True).collect()}
    assert feats2 == {r["media_id"]: r["feat"] for r in feats}


def test_multimodal_stub_raises(spark):
    media = synth_media(spark, 5)
    with pytest.raises(Exception) as exc:
        decode_features(media, fake_decoder=False).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_frame_sample_plan(spark):
    media = synth_media(spark, 30)
    plan = frame_sample_plan(media, every_ms=1000)
    rows = plan.collect()
    vids = {r["media_id"]: r["meta"]["duration_ms"] for r in media.collect()
            if r["kind"] == "video" and r["meta"]["duration_ms"]}
    counts = {}
    for r in rows:
        counts[r["media_id"]] = counts.get(r["media_id"], 0) + 1
    assert counts == {mid: math.ceil(dur / 1000) for mid, dur in vids.items()}


def test_ann_bruteforce_string_ids_fall_back_to_sql(spark):
    """Non-integral id columns must still work: the GEMV scorer packs ids
    into int64, so string ids route to the sql scorer with identical
    results and the id type preserved."""
    emb, vecs = _emb(spark)
    s_emb = emb.select(
        F.concat(F.lit("v"), F.col("vec_id").cast("string")).alias("vec_id"),
        "embedding",
    )
    got = ann_topk_bruteforce(s_emb, s_emb, k=3).collect()
    assert dict(ann_topk_bruteforce(s_emb, s_emb, k=3).dtypes)["query_id"] == "string"
    long_got = ann_topk_bruteforce(emb, emb, k=3).collect()
    exp = {
        ("v%d" % r["query_id"], r["rank"]): ("v%d" % r["neighbor_id"], r["cosine"])
        for r in long_got
    }
    # string ids sort differently ("v10" < "v2") — only cosine ties can
    # reorder; compare the (query, rank) -> cosine map, and neighbor ids
    # where the cosine is unique
    for r in got:
        e_nid, e_cos = exp[(r["query_id"], r["rank"])]
        assert math.isclose(r["cosine"], e_cos, abs_tol=2e-6)


def test_blocked_ops_release_cached_blocks(spark):
    """Each hash-once blocked operator persists intermediates (shingles,
    candidates, chunks, buckets) and returns a LAZY result. While the
    caller holds the result the intermediates stay cached (that is what
    makes a second action cheap); once the result is garbage-collected,
    the attached finalizer (caching.release_on_gc) unpersists them — no
    cached blocks outlive the caller's use of the result."""
    import gc
    import time

    sc = spark.sparkContext
    docs = _docs(spark)
    emb, _ = _emb(spark)

    def n_cached():
        return len(sc._jsc.sc().getRDDStorageInfo())

    ops = [
        lambda: minhash_lsh_pairs(docs, n=3, threshold=0.2),
        lambda: simhash_pairs(docs),
        lambda: ngram_jaccard_pairs(docs, n=3, threshold=0.2),
        lambda: ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_df=10),
        lambda: embedding_cosine_pairs_lsh(emb, threshold=0.9, dim=16),
    ]
    for i, op in enumerate(ops):
        before = n_cached()
        res = op()
        res.count()
        res.count()  # second action must not recompute hash-once tables
        del res
        gc.collect()
        deadline = time.time() + 10
        while n_cached() > before and time.time() < deadline:
            time.sleep(0.1)
        # <= : the gc pass may also have collected frames from EARLIER
        # tests sharing this session, dropping the count below baseline
        assert n_cached() - before <= 0, f"op {i} leaked cached intermediates"


def _planted_mega_bucket_docs(spark, n_planted=150):
    """A template-page skew corpus: ``n_planted`` byte-identical boilerplate
    docs (every band/chunk bucket they touch holds all of them) + a handful
    of distinct docs including one genuine near-dup pair (9/10) that lives
    in small buckets."""
    rows = [(i, "standard template page boilerplate footer nav " * 8) for i in range(n_planted)]
    base = 10_000
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "alpha beta gamma delta epsilon zeta eta theta iota mu",  # near-dup of ^
        "one two three four five six seven eight nine ten",
        "red orange yellow green blue indigo violet pink black white",
        "north south east west up down left right forward backward",
    ]
    rows += [(base + i, t) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_bucket_cap_bounds_mega_bucket(spark):
    """VERDICT r04 #3: a planted mega-bucket (template pages) makes the
    uncapped band-bucket self-join quadratic in the bucket; ``max_bucket``
    keeps candidate volume linear while true near-dups in small buckets
    are still found."""
    n_planted = 150
    docs = _planted_mega_bucket_docs(spark, n_planted)

    uncapped = minhash_lsh_candidates(docs, n=3).count()
    assert uncapped >= n_planted * (n_planted - 1) // 2  # quadratic blow-up

    capped = minhash_lsh_candidates(docs, n=3, max_bucket=50).count()
    assert capped < 50 * 50  # bounded by cap² per bucket, tiny here

    pairs = minhash_lsh_pairs(docs, n=3, threshold=0.5, max_bucket=50)
    found = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (10_000, 10_001) in found  # small-bucket near-dup survives the cap
    assert all(a >= 10_000 for a, _ in found)  # template family generated none

    # occupancy profile (the cap-choosing diagnostic): the mega bucket is
    # visible, and every bucket the planted family touches holds all of it
    sizes = minhash_band_bucket_sizes(docs, n=3)
    assert sizes.agg(F.max("n_docs")).first()[0] == n_planted


def test_simhash_chunk_cap_bounds_mega_bucket(spark):
    """Chunk-bucket twin of the MinHash cap test: identical boilerplate
    docs share all 4 chunks, so each of their chunk buckets is quadratic
    uncapped; the cap drops them while near-dups in small buckets stay."""
    n_planted = 120
    docs = _planted_mega_bucket_docs(spark, n_planted)

    uncapped = simhash_pairs(docs, max_hamming=3)
    n_uncapped = uncapped.count()
    assert n_uncapped >= n_planted * (n_planted - 1) // 2  # all-identical pairs

    capped = simhash_pairs(docs, max_hamming=3, max_bucket=50)
    got = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert all(a >= 10_000 for a, _ in got)  # template family suppressed
    # the 9/10-token near-dup pair differs by one token: its simhashes are
    # within small Hamming distance and its chunk buckets are tiny
    sim = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    if bin(sim[10_000] ^ sim[10_001]).count("1") <= 3:
        assert (10_000, 10_001) in got

    prof = simhash_chunk_bucket_sizes(docs)
    assert prof.agg(F.max("n_docs")).first()[0] >= n_planted


def test_explicit_release_handle(spark):
    """``result.release_intermediates()`` — the deterministic release path
    for callers that chain transformations off the result (the
    derived-frame pitfall, caching.release_on_gc): releases now on any
    interpreter, idempotent, and safe with the GC finalizer afterwards."""
    import gc
    import time

    sc = spark.sparkContext
    docs = _docs(spark)

    def n_cached():
        return len(sc._jsc.sc().getRDDStorageInfo())

    before = n_cached()
    res = minhash_lsh_pairs(docs, n=3, threshold=0.2)
    derived = res.where("jaccard >= 0.5")  # caller-side derivation
    derived.count()
    assert n_cached() > before  # hash-once intermediates are cached
    res.release_intermediates()
    deadline = time.time() + 10
    while n_cached() > before and time.time() < deadline:
        time.sleep(0.1)
    assert n_cached() - before <= 0
    res.release_intermediates()  # idempotent (finalizer runs at most once)
    del res
    gc.collect()  # GC path after explicit release: no error, no double-free


def test_sidecar_store_parity(spark, tmp_path):
    """The sidecar parquet stores (signatures / token hashes / buckets /
    cells) are a pure materialization seam: every operator's output with
    the store enabled is IDENTICAL to the in-memory path. This is the
    contract the DuckDB oracles rely on — the store must be exactly what
    the downstream join consumed."""
    from citation_graph_spark.pipeline.similarity import (
        ann_ivf_topk,
        ann_lsh_topk,
        embedding_cosine_pairs_lsh,
    )

    docs = _docs(spark)
    emb, _ = _emb(spark)
    qs = emb.limit(3)
    side = str(tmp_path / "store")

    cases = [
        (
            lambda **kw: minhash_lsh_pairs(docs, n=3, threshold=0.2, **kw),
            {"signatures_out": f"{side}/sig"},
        ),
        (
            lambda **kw: simhash64(docs, **kw),
            {"token_hashes_out": f"{side}/tok"},
        ),
        (
            lambda **kw: embedding_cosine_pairs_lsh(
                emb, threshold=0.9, dim=16, **kw
            ),
            {"buckets_out": f"{side}/eb"},
        ),
        (
            lambda **kw: ann_lsh_topk(qs, emb, k=3, dim=16, **kw),
            {"buckets_out": f"{side}/lb"},
        ),
        (
            lambda **kw: ann_ivf_topk(
                qs, emb, k=3, dim=16, n_centroids=4, n_probe=2, n_assign=2, **kw
            ),
            {"cells_out": f"{side}/cells"},
        ),
    ]
    for fn, kw in cases:
        plain = sorted(map(tuple, fn().collect()))
        stored = sorted(map(tuple, fn(**kw).collect()))
        assert stored == plain, kw
        import os as _os

        path = next(iter(kw.values()))
        root = path if _os.path.isdir(path) else _os.path.dirname(path)
        assert any(
            f.endswith(".parquet")
            for _, _, files in _os.walk(root)
            for f in files
        ), f"no parquet written under {root}"
