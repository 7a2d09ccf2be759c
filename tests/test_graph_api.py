import math

from citation_graph_spark import datagen
from citation_graph_spark.graph import LinkGraph


def test_linkgraph_end_to_end(spark):
    pages = datagen.generate_pages(spark, 250, seed=42).cache()
    g = LinkGraph.from_pages(pages, max_per_src=10).cache()

    assert g.vertices().count() > 0
    deg = g.degrees()
    assert {c for c in deg.columns} == {"id", "out_degree", "in_degree"}

    pr = g.pagerank(tol=1e-6)
    assert pr.converged
    assert math.isclose(pr.ranks.groupBy().sum("rank").first()[0], 1.0, abs_tol=1e-6)

    cc = g.connected_components()
    assert cc.converged

    lpa = g.label_propagation(max_iter=3)
    assert lpa.labels.count() == g.vertices().count()

    assert g.triangle_count() >= 0

    root = datagen.page_url(0)
    bfs = g.bfs(root, max_depth=1)
    assert bfs.visited.where(f"id = '{root}'").count() == 1


def test_linkgraph_centralities_and_metrics(spark):
    from pyspark.sql import functions as F

    pages = datagen.generate_pages(spark, 250, seed=42).cache()
    g = LinkGraph.from_pages(pages, max_per_src=10, encode="hash").cache()

    bc = g.betweenness(n_roots=4, max_d=2)
    assert bc.scores.where("betweenness < 0").count() == 0

    hc = g.harmonic_centrality(max_d=2, k=16)
    assert hc.columns == ["id", "harmonic"]

    rec = g.reciprocity().first()
    assert 0.0 <= rec["reciprocity"] <= 1.0
    assert g.degree_assortativity().first()["n_edges"] == rec["total_edges"]
    assert g.degree_histogram().count() > 0

    mapping = g.vertices().select(
        F.col("id"), (F.col("id") % 7).alias("group")
    )
    host = g.coarsen(mapping)
    assert host.edges.count() <= rec["total_edges"]
    assert host.degrees().count() <= 14
