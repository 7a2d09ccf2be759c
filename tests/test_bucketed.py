"""Durable CSR-style layout evidence: a table written with
``write_bucketed`` (bucketBy src, sortBy (src, dst)) must feed superstep
joins and per-src aggregations WITHOUT an Exchange on the edge side —
the no-shuffle property the design claims for the 100 TB layout.

(The input_hint names Iceberg; this sandbox has no Iceberg jar and no
network, so the warehouse-backed parquet bucketing — the same partition-
pruning/no-shuffle contract through Spark's catalog — is the provable
path. ``sources/pages.py`` keeps the format('iceberg') branch for
clusters that have the runtime jar.)"""

import pyspark.sql.functions as F

from citation_graph_spark.edges import write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_table_no_exchange(spark):
    edges = spark.range(0, 4000).select(
        (F.col("id") % 500).alias("src"),
        ((F.col("id") * 7) % 997).alias("dst"),
        (F.col("id") % 5).cast("int").alias("pos"),
    )
    spark.sql("DROP TABLE IF EXISTS edges_bkt")
    write_bucketed(edges, "edges_bkt", buckets=8)
    tbl = spark.table("edges_bkt")
    assert tbl.count() == 4000

    # per-src aggregation: bucket-local, zero Exchange anywhere in the plan
    agg_plan = _plan(tbl.groupBy("src").agg(F.count("*").alias("d")))
    assert "Exchange" not in agg_plan, agg_plan

    # superstep-shaped join (ranks ⋈ edges on src, merge-hinted like
    # pagerank): exactly ONE Exchange — the small rank side; the bucketed
    # edge side is read in place
    ranks = spark.range(0, 500).select(F.col("id"), F.lit(1.0).alias("rank"))
    joined = ranks.join(tbl.hint("merge"), ranks.id == tbl.src)
    plan = _plan(joined.groupBy("dst").agg(F.sum("rank").alias("m")))
    assert "Bucketed: true" in plan, plan
    n_exchanges_before_agg = plan.split("HashAggregate")[-1].count("Exchange")
    assert n_exchanges_before_agg == 1, plan

    spark.sql("DROP TABLE edges_bkt")


def test_bucketed_bucket_pruning_filter(spark):
    """Point lookups on the bucket key read one bucket (SelectedBucketsCount
    in the scan), the bucketed analog of partition pruning."""
    edges = spark.range(0, 2000).select(
        (F.col("id") % 100).alias("src"),
        (F.col("id") % 997).alias("dst"),
        F.lit(1).cast("int").alias("pos"),
    )
    spark.sql("DROP TABLE IF EXISTS edges_bkt_prune")
    write_bucketed(edges, "edges_bkt_prune", buckets=8)
    # autoBucketedScan drops bucketed reads when no operator needs the
    # distribution (a bare filter doesn't) — pin it on to expose pruning
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "false")
        q = spark.table("edges_bkt_prune").where(F.col("src") == 42)
        plan = _plan(q)
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
        assert q.count() == 20
    finally:
        spark.conf.set(key, old)
        spark.sql("DROP TABLE edges_bkt_prune")


def test_prepared_graph_from_bucketed_table(spark):
    """PreparedGraph.from_bucketed_table builds the weighted edge cache
    with ZERO Exchange (the bucketed layout already co-locates and sorts
    by src), and pagerank over it matches the in-memory path exactly."""
    import math

    from citation_graph_spark.operators.pagerank import pagerank
    from citation_graph_spark.operators.prepared import PreparedGraph

    edges = spark.range(0, 3000).select(
        (F.col("id") % 300).alias("src"),
        ((F.col("id") * 13) % 401).alias("dst"),
        (F.col("id") % 5).cast("int").alias("pos"),
    )
    spark.sql("DROP TABLE IF EXISTS edges_bkt_pg")
    write_bucketed(edges, "edges_bkt_pg", buckets=8)
    try:
        pg = PreparedGraph.from_bucketed_table(spark, "edges_bkt_pg")
        w = pg.weighted_edges()
        # no SHUFFLE exchange anywhere in the weighted-cache build: the
        # edge table is never redistributed (a BroadcastExchange of the
        # small degree side is fine — that's not a shuffle of the edges)
        assert "Exchange hashpartitioning" not in _plan(w), _plan(w)
        assert "Bucketed: true" in _plan(w), _plan(w)

        # superstep-shaped join: above the cache boundary (the part
        # executed EVERY superstep) the edge side is a bare cache scan —
        # the only Sort and the only shuffle belong to the rank side
        ranks = spark.range(0, 300).select(F.col("id"), F.lit(1.0).alias("rank"))
        joined = ranks.join(w.hint("merge"), ranks.id == w.src)
        per_step = _plan(
            joined.groupBy("dst").agg(F.sum(F.col("rank") * F.col("w")).alias("m"))
        ).split("InMemoryRelation")[0]
        assert per_step.count("Sort [") == 1, per_step
        # two shuffles total: rank side into the join + the dst aggregation
        assert per_step.count("Exchange hashpartitioning") == 2, per_step

        baseline = {
            r["id"]: r["rank"] for r in pagerank(edges, tol=1e-9).ranks.collect()
        }
        got = {
            r["id"]: r["rank"]
            for r in pagerank(prepared=pg, tol=1e-9).ranks.collect()
        }
        assert set(got) == set(baseline)
        for v in baseline:
            assert math.isclose(got[v], baseline[v], abs_tol=1e-12), v
        pg.unpersist()
    finally:
        spark.sql("DROP TABLE edges_bkt_pg")
