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
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash_pairs,
)
from citation_graph_spark.pipeline.multimodal import (
    decode_features,
    frame_sample_plan,
    synth_media,
)
from citation_graph_spark.pipeline.similarity import ann_lsh_topk, ann_topk_bruteforce
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


def test_ann_lsh_recalls_planted_pair(spark):
    emb, _ = _emb(spark)
    got = ann_lsh_topk(emb, emb, k=3, dim=16, tables=4, planes=6).collect()
    top1 = {r["query_id"]: r["neighbor_id"] for r in got if r["rank"] == 1}
    assert top1.get(2) == 5 and top1.get(5) == 2  # near-identical pair found


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
