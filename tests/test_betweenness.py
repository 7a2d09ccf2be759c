"""Depth-bounded sampled Brandes vs an exact pure-python replay."""

import collections

import pytest

from citation_graph_spark import datagen
from citation_graph_spark.datagen import _edges_df
from citation_graph_spark.operators.betweenness import betweenness


def _edge_list(df):
    return [(r["src"], r["dst"]) for r in df.select("src", "dst").collect()]


def brandes_oracle(edges, roots, max_d):
    """Exact truncated Brandes: BFS to depth max_d per root, then the
    dependency accumulation over that truncated DAG. Returns
    (bc dict over visited vertices, sigma dict keyed (root, id, dist))."""
    adj = collections.defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
    bc = collections.defaultdict(float)
    sigmas = {}
    visited_any = set()
    for s in roots:
        dist = {s: 0}
        sigma = {s: 1}
        levels = [[s]]
        for d in range(max_d):
            nxt = collections.defaultdict(int)
            for u in levels[-1]:
                for w in adj[u]:
                    if w not in dist or dist[w] == d + 1:
                        nxt[w] += sigma[u]
            new = [w for w in nxt if w not in dist]
            for w in new:
                dist[w] = d + 1
                sigma[w] = nxt[w]
            if not new:
                break
            levels.append(sorted(new))
        for v, dd in dist.items():
            sigmas[(s, v, dd)] = sigma[v]
            visited_any.add(v)
        delta = collections.defaultdict(float)
        for lvl in reversed(levels[1:]):
            for w in lvl:
                for u in (x for x in dist if dist[x] == dist[w] - 1):
                    if w in adj[u]:
                        delta[u] += sigma[u] / sigma[w] * (1 + delta[w])
        for v in dist:
            if v != s:
                bc[v] += delta[v]
    return {v: bc.get(v, 0.0) for v in visited_any}, sigmas


def test_betweenness_path_closed_form(spark):
    # directed path 1->2->3->4: bc(2)=2 (pairs 1-3,1-4... wait truncated
    # at max_d=3 covers all): from root 1: delta(2)=2, delta(3)=1; root 2:
    # delta(3)=1; root 3: none beyond. With roots {1,2,3,4}:
    # bc(2)=2, bc(3)=1+1=2, bc(4)=0
    edges = _edges_df(spark, [(1, 2), (2, 3), (3, 4)])
    res = betweenness(edges, roots=[1, 2, 3, 4], max_d=3)
    got = {r["id"]: r["betweenness"] for r in res.scores.collect()}
    assert got == {1: 0.0, 2: 2.0, 3: 2.0, 4: 0.0}


def test_betweenness_diamond_sigma_split(spark):
    # 1->{2,3}->4: two shortest paths 1..4; bc(2)=bc(3)=0.5 from root 1
    edges = _edges_df(spark, [(1, 2), (1, 3), (2, 4), (3, 4)])
    res = betweenness(edges, roots=[1], max_d=2)
    got = {r["id"]: r["betweenness"] for r in res.scores.collect()}
    assert got[2] == pytest.approx(0.5)
    assert got[3] == pytest.approx(0.5)
    assert got[4] == 0.0
    sig = {
        (r["root"], r["id"], r["dist"]): int(r["sigma"])
        for r in res.per_vertex.collect()
    }
    assert sig[(1, 4, 2)] == 2  # two shortest paths reach 4


def test_betweenness_zipf_vs_oracle(spark):
    edges = datagen.zipf_edges(spark, n_vertices=300, n_edges=1500, seed=9).cache()
    roots = sorted({s for s, _ in _edge_list(edges)})[:5]
    want_bc, want_sigma = brandes_oracle(_edge_list(edges), roots, 3)
    res = betweenness(edges, roots=roots, max_d=3)
    got = {r["id"]: r["betweenness"] for r in res.scores.collect()}
    assert set(got) == set(want_bc)
    for v, b in want_bc.items():
        assert got[v] == pytest.approx(b, abs=1e-9), v
    got_sigma = {
        (r["root"], r["id"], r["dist"]): int(r["sigma"])
        for r in res.per_vertex.collect()
    }
    assert got_sigma == want_sigma  # path counts are bit-exact integers


def test_betweenness_default_roots_and_scale(spark):
    edges = datagen.zipf_edges(spark, n_vertices=200, n_edges=800, seed=2).cache()
    srcs = sorted({s for s, _ in _edge_list(edges)})
    res = betweenness(edges, n_roots=3, max_d=2, scale=10.0)
    assert res.n_roots == 3
    assert sorted(r["root"] for r in res.per_vertex.select("root").distinct().collect()) == srcs[:3]
    raw = betweenness(edges, roots=srcs[:3], max_d=2)
    got = {r["id"]: r["betweenness"] for r in res.scores.collect()}
    want = {r["id"]: 10.0 * r["betweenness"] for r in raw.scores.collect()}
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12)


def test_betweenness_empty_and_isolated(spark):
    from pyspark.sql import functions as F

    edges = _edges_df(spark, [(1, 2)]).where(F.lit(False))
    res = betweenness(edges, roots=[1], max_d=3)
    # root 1 is still "visited" (level 0), with bc 0
    got = {r["id"]: r["betweenness"] for r in res.scores.collect()}
    assert got == {1: 0.0}
