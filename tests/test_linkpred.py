"""Link prediction (common neighbors / Jaccard / Adamic-Adar) vs the
pure-python oracle (tests/oracles.py)."""

import math

from citation_graph_spark import datagen
from citation_graph_spark.operators.linkpred import link_prediction_scores
from tests.oracles import linkpred_oracle


def _edge_list(df):
    return [(r["src"], r["dst"]) for r in df.select("src", "dst").collect()]


def _scores(res):
    return {
        (r["a"], r["b"]): (r["common"], r["jaccard"], r["adamic_adar"])
        for r in res.scores.collect()
    }


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_path_endpoints(spark):
    # path 0-1-2: the only candidate pair is (0, 2) through center 1;
    # deg(1)=2 → adamic_adar = 1/ln 2; jaccard = 1/(1+1-1) = 1
    edges = _df(spark, [(0, 1), (1, 2)])
    res = link_prediction_scores(edges)
    got = _scores(res)
    assert set(got) == {(0, 2)}
    c, j, aa = got[(0, 2)]
    assert c == 1 and j == 1.0
    assert math.isclose(aa, 1.0 / math.log(2), rel_tol=1e-12)
    assert res.dropped_centers == 0


def test_existing_edges_excluded(spark):
    # triangle: every pair is already an edge — no candidates at all
    edges = _df(spark, [(0, 1), (1, 2), (2, 0)])
    assert _scores(link_prediction_scores(edges)) == {}


def test_zipf_matches_oracle(spark):
    edges = datagen.zipf_edges(spark, n_vertices=150, n_edges=900, seed=17).cache()
    elist = _edge_list(edges)
    for cap in (None, 10):
        res = link_prediction_scores(edges, min_common=2, max_center_degree=cap)
        got = _scores(res)
        exp = linkpred_oracle(elist, min_common=2, max_center_degree=cap)
        assert set(got) == set(exp), cap
        for k in exp:
            assert got[k][0] == exp[k][0], (k, cap)
            assert math.isclose(got[k][1], exp[k][1], rel_tol=1e-12), (k, cap)
            assert math.isclose(got[k][2], exp[k][2], rel_tol=1e-9), (k, cap)


def test_center_cap_drops_hub(spark):
    # star hub 0 with 20 leaves: uncapped, every leaf pair is a candidate
    # (through the hub); capping below 20 removes the hub center and with
    # it every candidate — and reports exactly one dropped center
    edges = _df(spark, [(0, i) for i in range(1, 21)])
    uncapped = link_prediction_scores(edges)
    assert len(_scores(uncapped)) == 20 * 19 // 2
    capped = link_prediction_scores(edges, max_center_degree=10)
    assert _scores(capped) == {}
    assert capped.dropped_centers == 1
