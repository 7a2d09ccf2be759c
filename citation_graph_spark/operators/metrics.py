"""Whole-graph structure metrics — reciprocity, degree assortativity,
log-binned degree distributions, and supervertex coarsening.

These are the standard web-graph measurements (link reciprocity and the
in/out-degree power laws are the headline statistics of the classic
web-crawl studies; degree assortativity is Newman's mixing coefficient;
page→host coarsening is how a 10^12-page link graph is reduced to the
~10^8-host graph that most whole-web analyses actually run on). The
reference engine has no analog — its graph never leaves the driver
process (``src/citation_graph/database.py:12-18`` keeps adjacency as
in-memory lists) — so these document their own scale contracts instead of
a reference file.

Scale contracts (read each docstring for specifics):

- Every metric is a constant number of joins/aggregations — **no
  iteration, no windows, no driver-side loops**. Wall-clock at 100 TB is
  bounded by one or two shuffles of the edge table.
- Degree tables are |V|-sized: NOT broadcastable at web scale. Joins
  against them are plain equi-joins on the edge key so Catalyst/AQE picks
  SMJ (and splits skewed hub partitions). When the edge table is already
  hash-partitioned by ``src`` (the ``PreparedGraph`` layout), the
  out-degree join reuses that exchange; only the ``dst``-side join adds a
  shuffle.
- Aggregate moments are accumulated as ``decimal(38,0)`` — exact integer
  arithmetic, deterministic under any partitioning / accumulation order
  (a double sum would re-associate). The final scalar is ONE fixed-shape
  double expression over those exact integers, so two engines computing
  the same formula agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_DEC = "decimal(38,0)"


def _simple_edges(edges: DataFrame) -> DataFrame:
    """Distinct (src, dst) pairs with self-loops removed — the simple
    directed graph all metrics in this module are defined on."""
    return (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def reciprocity(edges: DataFrame) -> DataFrame:
    """Link reciprocity: the fraction of directed edges (u, v) whose
    reverse (v, u) is also present (self-loops excluded, multi-edges
    collapsed).

    Returns a single row ``(mutual_edges, total_edges, reciprocity)``.

    Shape: one ``distinct`` on the edge pair (the same shuffle every
    simple-graph metric pays) + one self-semi-join on the reversed key —
    an equi-join on (src, dst), so SMJ/shuffle-hash at scale, no
    broadcast of anything |E|-sized. Skewed hubs are symmetric on both
    sides of the join key pair, so AQE skew-split handles them.
    """
    e = _simple_edges(edges)
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    mutual = e.join(rev, ["src", "dst"], "left_semi")
    return (
        mutual.agg(F.count("*").alias("mutual_edges"))
        .crossJoin(e.agg(F.count("*").alias("total_edges")))
        .select(
            "mutual_edges",
            "total_edges",
            F.when(F.col("total_edges") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.col("mutual_edges").cast("double")
                    / F.col("total_edges").cast("double"),
                    6,
                )
            )
            .alias("reciprocity"),
        )
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Newman's directed (out, in) degree assortativity: the Pearson
    correlation, over edges e = (u, v) of the simple graph, between
    x_e = out-degree(u) and y_e = in-degree(v).

        r = (M·Σxy − Σx·Σy) / sqrt((M·Σx² − (Σx)²) · (M·Σy² − (Σy)²))

    Returns one row ``(n_edges, assortativity)``; ``assortativity`` is
    NULL for degenerate graphs (zero variance on either side).

    Determinism: the five moments (M, Σx, Σy, Σxy, Σx², Σy²) are exact
    ``decimal(38,0)`` integers — no float accumulation — and r is one
    fixed double expression over them, so the value is bit-stable across
    partitionings and engines. (A ``corr()`` aggregate would be
    accumulation-order-dependent.)

    Shape: degree groupBys (map-side partial agg) + two equi-joins of the
    edge table against the |V|-sized degree tables (src join reuses a
    src-partitioned layout; dst join is the one extra shuffle) + one
    global agg. At 10^12 edges the decimal moments stay exact up to 10^38.
    """
    e = _simple_edges(edges)
    out_deg = e.groupBy("src").agg(F.count("*").alias("x"))
    in_deg = e.groupBy("dst").agg(F.count("*").alias("y"))
    per_edge = e.join(out_deg, "src").join(in_deg, "dst")
    moments = per_edge.agg(
        F.count("*").cast(_DEC).alias("m"),
        F.sum(F.col("x").cast(_DEC)).alias("sx"),
        F.sum(F.col("y").cast(_DEC)).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(_DEC)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(_DEC)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(_DEC)).alias("syy"),
    )
    num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return moments.select(
        F.col("m").cast("long").alias("n_edges"),
        F.when((vx <= 0) | (vy <= 0), F.lit(None).cast("double"))
        .otherwise(F.round(num / F.sqrt(vx * vy), 6))
        .alias("assortativity"),
    )


def degree_histogram(edges: DataFrame) -> DataFrame:
    """Log2-binned in/out-degree distribution of the simple graph — the
    classic power-law plot, as data.

    One row per (side, bin): ``side`` ∈ {'out', 'in'}, ``bin`` =
    floor(log2(degree)) computed as ``length(bin(degree)) − 1`` — pure
    integer bit arithmetic, immune to the fp-rounding ambiguity of
    ``floor(log2(d))`` at exact powers of two — plus the vertex count and
    the exact min/max degree landing in the bin.

    Shape: two degree groupBys + two tiny (≤64-row·sides) re-aggs. The
    second agg's input is |V| rows of two ints — map-side partials make
    the shuffle bytes negligible at any scale.
    """
    e = _simple_edges(edges)

    def hist(deg: DataFrame, side: str) -> DataFrame:
        binned = deg.select(
            (F.length(F.bin(F.col("degree"))) - 1).cast("int").alias("bin"),
            "degree",
        )
        return binned.groupBy("bin").agg(
            F.lit(side).alias("side"),
            F.count("*").alias("n_vertices"),
            F.min("degree").alias("min_degree"),
            F.max("degree").alias("max_degree"),
        )

    out_deg = e.groupBy("src").agg(F.count("*").alias("degree"))
    in_deg = e.groupBy("dst").agg(F.count("*").alias("degree"))
    return (
        hist(out_deg, "out")
        .unionByName(hist(in_deg, "in"))
        .select("side", "bin", "n_vertices", "min_degree", "max_degree")
    )


def coarsen(
    edges: DataFrame,
    mapping: DataFrame,
    drop_self_loops: bool = True,
) -> DataFrame:
    """Supervertex coarsening: contract vertices into groups and aggregate
    the multi-edges — the page→host (and host→domain) reduction every
    whole-web analysis starts with.

    ``mapping`` is an (id, group) DataFrame covering every vertex; edges
    whose endpoint is missing from the mapping are dropped (disclosed
    semantics — at web scale the mapping is derived from the same vertex
    universe, so coverage is total). Output: one row per (src, dst)
    supervertex pair with ``weight`` = number of underlying simple-graph
    edges. ``drop_self_loops=True`` removes intra-group edges (the
    intra-host links that dominate raw web counts).

    Shape: two equi-joins edge⋈mapping (mapping is |V|-sized — SMJ, not
    broadcast; the src-side join reuses a src-partitioned edge layout) +
    one groupBy on the group pair. The output graph is orders of
    magnitude smaller than the input, so everything downstream of the
    groupBy is cheap. Hub hosts skew the groupBy key; map-side partial
    counts absorb most of it, AQE skew-split the rest.
    """
    e = _simple_edges(edges)
    src_map = mapping.select(
        F.col("id").alias("src"), F.col("group").alias("src_group")
    )
    dst_map = mapping.select(
        F.col("id").alias("dst"), F.col("group").alias("dst_group")
    )
    contracted = e.join(src_map, "src").join(dst_map, "dst")
    if drop_self_loops:
        contracted = contracted.where(F.col("src_group") != F.col("dst_group"))
    return (
        contracted.groupBy(
            F.col("src_group").alias("src"), F.col("dst_group").alias("dst")
        )
        .agg(F.count("*").alias("weight"))
    )
