"""Whole-graph structure metrics vs exact pure-python oracles."""

import collections
import math

import pytest

from citation_graph_spark import datagen
from citation_graph_spark.datagen import _edges_df
from citation_graph_spark.operators.metrics import (
    coarsen,
    degree_assortativity,
    degree_histogram,
    reciprocity,
)


def _edge_list(df):
    return [(r["src"], r["dst"]) for r in df.select("src", "dst").collect()]


def _simple(edges):
    return {(s, d) for s, d in edges if s != d}


def assortativity_oracle(edges):
    e = sorted(_simple(edges))
    if not e:
        return None
    od = collections.Counter(s for s, _ in e)
    idg = collections.Counter(d for _, d in e)
    xs = [od[s] for s, _ in e]
    ys = [idg[d] for _, d in e]
    m = len(e)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    vx, vy = m * sxx - sx * sx, m * syy - sy * sy
    if vx <= 0 or vy <= 0:
        return None
    return (m * sxy - sx * sy) / math.sqrt(float(vx) * float(vy))


def test_reciprocity_closed_form(spark):
    # {(1,2),(2,1),(1,3)} plus a self-loop and a duplicate to ignore
    edges = _edges_df(spark, [(1, 2), (2, 1), (1, 3), (1, 3), (4, 4)])
    row = reciprocity(edges).first()
    assert row["mutual_edges"] == 2
    assert row["total_edges"] == 3
    assert row["reciprocity"] == pytest.approx(2 / 3, abs=1e-6)


def test_reciprocity_extremes(spark):
    none = _edges_df(spark, [(1, 2), (2, 3), (3, 1)])  # a directed cycle
    assert reciprocity(none).first()["reciprocity"] == 0.0
    full = _edges_df(spark, [(1, 2), (2, 1), (2, 3), (3, 2)])
    assert reciprocity(full).first()["reciprocity"] == 1.0
    empty = _edges_df(spark, [(7, 7)])  # only a self-loop -> empty simple graph
    row = reciprocity(empty).first()
    assert row["total_edges"] == 0 and row["reciprocity"] == 0.0


def test_reciprocity_zipf_vs_oracle(spark):
    edges = datagen.zipf_edges(spark, n_vertices=400, n_edges=3000, seed=11).cache()
    simple = _simple(_edge_list(edges))
    mutual = sum(1 for s, d in simple if (d, s) in simple)
    row = reciprocity(edges).first()
    assert row["mutual_edges"] == mutual
    assert row["total_edges"] == len(simple)
    assert row["reciprocity"] == pytest.approx(round(mutual / len(simple), 6))


def test_assortativity_vs_oracle(spark):
    edges = datagen.zipf_edges(spark, n_vertices=400, n_edges=3000, seed=3).cache()
    want = assortativity_oracle(_edge_list(edges))
    row = degree_assortativity(edges).first()
    assert row["n_edges"] == len(_simple(_edge_list(edges)))
    assert row["assortativity"] == pytest.approx(want, abs=1e-6)


def test_assortativity_degenerate_null(spark):
    # directed cycle: every out-degree and in-degree is 1 -> zero variance
    edges = _edges_df(spark, [(i, (i + 1) % 5) for i in range(5)])
    assert degree_assortativity(edges).first()["assortativity"] is None


def test_assortativity_star_negative(spark):
    # star out of a hub is disassortative once a few peripheral edges exist
    star = [(0, i) for i in range(1, 20)] + [(1, 2), (3, 4)]
    want = assortativity_oracle(star)
    got = degree_assortativity(_edges_df(spark, star)).first()["assortativity"]
    assert got == pytest.approx(want, abs=1e-6)
    assert got < 0


def test_degree_histogram_vs_oracle(spark):
    edges = datagen.zipf_edges(spark, n_vertices=400, n_edges=3000, seed=7).cache()
    simple = _simple(_edge_list(edges))
    rows = degree_histogram(edges).collect()
    got = {(r["side"], r["bin"]): r for r in rows}
    for side, degs in (
        ("out", collections.Counter(s for s, _ in simple)),
        ("in", collections.Counter(d for _, d in simple)),
    ):
        want = collections.defaultdict(list)
        for deg in degs.values():
            want[deg.bit_length() - 1].append(deg)
        assert {b for (s, b) in got if s == side} == set(want)
        for b, ds in want.items():
            r = got[(side, b)]
            assert r["n_vertices"] == len(ds)
            assert r["min_degree"] == min(ds)
            assert r["max_degree"] == max(ds)


def test_coarsen_host_graph(spark):
    # two "hosts" {0,1,2} and {10,11}: intra-host edges drop, cross-host
    # multi-edges aggregate into one weighted superedge
    edges = _edges_df(
        spark,
        [(0, 1), (1, 2), (0, 10), (1, 10), (2, 11), (10, 0), (11, 11), (0, 10)],
    )
    ids = [0, 1, 2, 10, 11]
    mapping = spark.createDataFrame(
        [(i, i // 10) for i in ids], "id long, group long"
    )
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in coarsen(edges, mapping).collect()
    }
    assert got == {(0, 1): 3, (1, 0): 1}


def test_coarsen_keep_self_loops_and_missing_mapping(spark):
    edges = _edges_df(spark, [(0, 1), (0, 99)])  # 99 unmapped -> edge dropped
    mapping = spark.createDataFrame([(0, 0), (1, 0)], "id long, group long")
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in coarsen(edges, mapping, drop_self_loops=False).collect()
    }
    assert got == {(0, 0): 1}
