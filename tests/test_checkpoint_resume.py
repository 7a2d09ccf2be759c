"""Kill/resume semantics (SURVEY.md §5.4): a run killed after iteration k,
resumed from checkpoint, must equal the uninterrupted run exactly."""

import math
import os
import shutil

from citation_graph_spark import datagen
from citation_graph_spark.operators.components import connected_components
from citation_graph_spark.operators.pagerank import pagerank
from tests.oracles import connected_components_oracle


def _ranks(res):
    return {r["id"]: r["rank"] for r in res.ranks.collect()}


def test_pagerank_kill_resume_exact(spark, tmp_path):
    edges = datagen.zipf_edges(spark, 150, 900, seed=17).cache()
    ck = str(tmp_path / "ck")

    full = pagerank(edges, tol=1e-7, checkpoint_dir=ck, durable_every=2)
    baseline = _ranks(full)
    assert full.converged

    # simulate a kill after iteration 4: drop all later durable state
    for name in os.listdir(ck):
        if name.startswith("iter=") and int(name.split("=")[1]) > 4:
            shutil.rmtree(os.path.join(ck, name))
    resumed = pagerank(edges, tol=1e-7, checkpoint_dir=ck, durable_every=2)
    got = _ranks(resumed)
    assert set(got) == set(baseline)
    for v in baseline:
        assert math.isclose(got[v], baseline[v], abs_tol=1e-12), v


def test_pagerank_resume_converged_is_instant(spark, tmp_path):
    edges = datagen.cycle_edges(spark, 12)
    ck = str(tmp_path / "ck2")
    first = pagerank(edges, tol=1e-8, checkpoint_dir=ck)
    again = pagerank(edges, tol=1e-8, checkpoint_dir=ck)
    assert again.converged
    assert again.history == []  # no supersteps re-run
    assert _ranks(again) == _ranks(first)


def test_two_star_matches_hash_min(spark):
    edges = datagen.zipf_edges(spark, 250, 400, seed=29).cache()
    elist = [(r["src"], r["dst"]) for r in edges.select("src", "dst").collect()]
    exp = connected_components_oracle(elist)
    hm = connected_components(edges, algorithm="hash_min")
    ts = connected_components(edges, algorithm="two_star")
    got_hm = {r["id"]: r["label"] for r in hm.labels.collect()}
    got_ts = {r["id"]: r["label"] for r in ts.labels.collect()}
    assert got_hm == exp
    assert got_ts == exp


def test_two_star_long_diameter_fewer_rounds(spark):
    # 60-cycle: diameter 30 → hash-min needs ~30 supersteps; two-star O(log n)
    edges = datagen.cycle_edges(spark, 60)
    ts = connected_components(edges, algorithm="two_star", max_iter=15)
    assert ts.converged
    labels = {r["id"]: r["label"] for r in ts.labels.collect()}
    assert set(labels.values()) == {0}
    assert ts.iterations <= 10
