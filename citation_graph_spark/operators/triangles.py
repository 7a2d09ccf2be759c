"""Triangle counting via degree-ordered edge orientation — two joins total.

Standard scalable construction (the "compact-forward" / degree-ordering
scheme): orient each undirected edge from the endpoint that is smaller in
the total order (degree, id) toward the larger. The oriented graph is
acyclic and every vertex has out-degree O(sqrt(|E|)), which bounds the
wedge join. Each triangle {a,b,c} with a < b < c in that order appears as
exactly one wedge (a→b, a→c) closed by the edge (b→c):

    wedges  = E' ⋈ E' on src        (pairs of out-neighbours)
    count   = wedges ⋉ E' on (dst1 → dst2)

Both joins are equi-joins on the oriented edge table, pre-partitioned on
``src`` — sort-merge/shuffle-hash picked by Catalyst, AQE splitting any
skewed hub partition. No iteration, no window sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from citation_graph_spark.edges import symmetrize


def _oriented(edges: DataFrame) -> DataFrame:
    """Undirected edges oriented by the (degree, id) total order; each
    undirected edge appears exactly once."""
    sym = symmetrize(edges)
    deg = sym.groupBy("src").agg(F.count("*").alias("deg")).withColumnRenamed("src", "id")
    with_deg = (
        sym.join(deg.withColumnRenamed("id", "src").withColumnRenamed("deg", "sdeg"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("deg", "ddeg"), "dst")
    )
    return with_deg.where(
        (F.col("sdeg") < F.col("ddeg"))
        | ((F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst")))
    ).select("src", "dst")


def _triangles_from(e: DataFrame) -> DataFrame:
    """Triangle rows (a, b, c) from an oriented edge table. ``e`` is
    referenced three times (wedge self-join + closing semi-join) — the
    caller must persist it or each reference recomputes the orientation."""
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    e3 = e.alias("e3")
    wedges = e1.join(e2, F.col("e1.src") == F.col("e2.src")).where(
        F.col("e1.dst") != F.col("e2.dst")
    )
    closed = wedges.join(
        e3,
        (F.col("e1.dst") == F.col("e3.src")) & (F.col("e2.dst") == F.col("e3.dst")),
    )
    return closed.select(
        F.col("e1.src").alias("a"), F.col("e1.dst").alias("b"), F.col("e2.dst").alias("c")
    )


def triangles(edges: DataFrame, oriented: DataFrame | None = None) -> DataFrame:
    """All triangles as rows (a, b, c) — a is the (degree, id)-smallest
    corner; each triangle exactly once.

    WARNING — plan cost: the oriented table is referenced THREE times in
    the result plan (wedge self-join + closing join). With the lazy
    default, an action on the raw triangle list recomputes the
    orientation (symmetrize + two degree joins) three times. Either use
    the terminal wrappers below (which persist the oriented table for the
    duration of one aggregation and release it afterwards), or pass a
    pre-persisted oriented frame via ``oriented`` (build it with
    ``oriented_edges(edges).persist()``) and own its release."""
    return _triangles_from(oriented if oriented is not None else _oriented(edges))


def oriented_edges(edges: DataFrame) -> DataFrame:
    """Public access to the degree-ordered orientation — persist this and
    pass it to ``triangles(edges, oriented=...)`` when you need the raw
    triangle list without paying the 3× orientation recompute."""
    return _oriented(edges)


def triangle_count(edges: DataFrame) -> int:
    """Total number of triangles in the undirected simple graph."""
    e = _oriented(edges).persist()
    try:
        return _triangles_from(e).count()
    finally:
        e.unpersist()


def local_clustering_coefficient(edges: DataFrame) -> DataFrame:
    """(id, triangles, degree, lcc) — local clustering coefficient
    ``lcc(v) = 2·T(v) / (deg(v)·(deg(v)−1))`` over the undirected simple
    graph (deg = distinct neighbours); vertices with deg < 2 get 0.0.

    Pure composition: the per-vertex triangle counts above plus one
    degree aggregation over the symmetrized view — no new join shapes,
    so the scale properties are exactly those of ``triangles`` (degree
    orientation bounds the wedge join) and the degree agg (map-side
    partials)."""
    tri = triangle_counts_per_vertex(edges)
    deg = (
        symmetrize(edges)
        .groupBy("src")
        .agg(F.count("*").alias("degree"))
        .select(F.col("src").alias("id"), "degree")
    )
    return tri.join(deg, "id", "left").select(
        "id",
        "triangles",
        F.coalesce("degree", F.lit(0)).alias("degree"),
        F.when(
            F.coalesce("degree", F.lit(0)) >= 2,
            F.lit(2.0)
            * F.col("triangles")
            / (F.col("degree") * (F.col("degree") - F.lit(1))).cast("double"),
        )
        .otherwise(0.0)
        .alias("lcc"),
    )


def triangle_counts_per_vertex(edges: DataFrame) -> DataFrame:
    """(id, triangles) — how many triangles each vertex participates in.
    Vertices in no triangle get 0.

    Lazy result (the caller owns its persistence — see caching.py); the
    persisted oriented-edge intermediate is released when the returned
    DataFrame is garbage-collected."""
    from citation_graph_spark.caching import release_on_gc

    e = _oriented(edges).persist()
    tri = _triangles_from(e)
    corners = (
        tri.select(F.col("a").alias("id"))
        .unionAll(tri.select(F.col("b").alias("id")))
        .unionAll(tri.select(F.col("c").alias("id")))
    )
    counts = corners.groupBy("id").agg(F.count("*").alias("triangles"))
    from citation_graph_spark.edges import vertices_of

    return release_on_gc(
        vertices_of(edges)
        .join(counts, "id", "left")
        .select("id", F.coalesce("triangles", F.lit(0)).alias("triangles")),
        e,
    )
