import pyspark.sql.functions as F

from citation_graph_spark import datagen
from citation_graph_spark.edges import build_edges, dedup_edges
from citation_graph_spark.extract import pages_to_raw_edges
from citation_graph_spark.operators.bfs import bfs_expand, spanning_tree_edges
from tests.oracles import bfs_oracle


def _visited(df):
    return {r["id"]: (r["depth"], r["parent"]) for r in df.collect()}


def _edges_with_pos(df):
    return [(r["src"], r["dst"], r["pos"]) for r in df.collect()]


def test_bfs_matches_oracle_on_zipf(spark):
    edges = dedup_edges(
        datagen.zipf_edges(spark, n_vertices=200, n_edges=1200, seed=21)
    ).cache()
    elist = _edges_with_pos(edges)
    exp = bfs_oracle(elist, root=1, max_depth=3)
    res = bfs_expand(edges, root=1, max_depth=3)
    assert _visited(res.visited) == exp


def test_bfs_fanout_cap(spark):
    edges = dedup_edges(
        datagen.zipf_edges(spark, n_vertices=100, n_edges=900, seed=33)
    ).cache()
    elist = _edges_with_pos(edges)
    exp = bfs_oracle(elist, root=2, max_depth=4, max_per_src=3)
    res = bfs_expand(edges, root=2, max_depth=4, max_per_src=3)
    assert _visited(res.visited) == exp


def test_bfs_exclude_list(spark):
    edges = dedup_edges(
        datagen.zipf_edges(spark, n_vertices=100, n_edges=600, seed=8)
    ).cache()
    elist = _edges_with_pos(edges)
    excl = {0, 1}  # exclude the hubs — reroutes the whole expansion
    exp = bfs_oracle(elist, root=5, max_depth=3, exclude=frozenset(excl))
    excl_df = spark.createDataFrame([(v,) for v in excl], "id long")
    res = bfs_expand(edges, root=5, max_depth=3, exclude=excl_df)
    assert _visited(res.visited) == exp


def test_bfs_over_extracted_pages(spark):
    """End-to-end: pages → extraction → BFS from a root url (the
    reference's whole program in three lines)."""
    pages = datagen.generate_pages(spark, 300, seed=42).cache()
    edges = build_edges(pages, encode="none").cache()
    root = datagen.page_url(0)
    res = bfs_expand(edges, root=root, max_depth=2, max_per_src=5)
    exp = bfs_oracle(
        [(r["src"], r["dst"], r["pos"]) for r in edges.collect()],
        root=root,
        max_depth=2,
        max_per_src=5,
    )
    assert _visited(res.visited) == exp
    # spanning tree: every non-root visited vertex has exactly one tree edge
    tree = spanning_tree_edges(res.visited)
    assert tree.count() == res.visited.count() - 1


def test_bfs_dead_end_root(spark):
    edges = dedup_edges(datagen.star_edges(spark, 10))
    res = bfs_expand(edges, root=0, max_depth=3)  # hub 0 has no out-edges
    assert _visited(res.visited) == {0: (0, None)}
    assert res.depth_reached == 0
