"""Weighted single-source shortest paths — frontier Bellman-Ford
supersteps, batched across a root set.

The classic distributed SSSP: state is the best-known distance per
(root, vertex); each superstep relaxes only edges out of vertices whose
distance IMPROVED last round (the frontier — the standard work-efficient
refinement of Bellman-Ford; with unit weights it degenerates to BFS).
Non-negative weights assumed (documented; negative-cycle detection is a
``max_rounds`` disclosure, not a crash).

Like every iterative operator in this engine (see
``operators/superstep.py``): the relax join is a plain equi-join of the
frontier against the edge table (SMJ/shuffle-hash, AQE skew-split for hub
vertices), the min-merge is a map-side-partial groupBy, convergence is
ONE driver scalar per superstep (the improved-row count — read off the
frame that must materialize anyway), and state lineage is truncated per
round via lazy ``localCheckpoint``. Integer weights stay integer-exact
end to end (``long`` distances — no float accumulation), which is what
lets the driver cell hash-match a SQL replay bit for bit.

The reference engine has no weighted-path analog (its traversal is
unweighted depth expansion, ``src/citation_graph/traverser.py:132-145``);
this documents its own contract.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

from pyspark.sql import DataFrame, functions as F

from citation_graph_spark.operators.superstep import SuperstepContext


@dataclass
class SsspResult:
    distances: DataFrame  # (root, id, dist)
    rounds: int
    converged: bool
    history: list[dict[str, Any]]


def sssp(
    edges: DataFrame,
    roots: Sequence[int] | DataFrame,
    weight_col: str = "weight",
    max_rounds: int = 30,
) -> SsspResult:
    """Batched multi-root SSSP (see module doc).

    ``edges``: (src, dst, <weight_col>) — parallel edges are fine (the
    min-merge keeps the cheapest); self-loops never improve a distance.
    ``roots``: ids (list or single-column DataFrame). Returns distances
    for every (root, reachable vertex); unreachable vertices are absent
    (the sparse contract — at web scale a dense |roots|·|V| output is the
    caller's explicit choice to materialize).
    """
    spark = edges.sparkSession
    # the engine's standard superstep layout: weight-deduped edges hash-
    # partitioned on the join key and sorted within partitions, persisted
    # once — every round's frontier SMJ re-sorts only the (small) frontier
    # side; the merge hint keeps AQE from flipping to a per-round broadcast
    num_partitions = edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
    e = (
        edges.select(
            "src", "dst", F.col(weight_col).cast("long").alias("w")
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .repartition(int(num_partitions), "src")
        .sortWithinPartitions("src")
        .persist()
    )
    e.count()
    if isinstance(roots, DataFrame):
        root_df = roots.select(F.col(roots.columns[0]).alias("root"))
    else:
        root_df = spark.createDataFrame([(int(r),) for r in roots], "root long")

    state = root_df.select(
        "root", F.col("root").alias("id"), F.lit(0).cast("long").alias("dist")
    )
    frontier = state
    ctx = SuperstepContext()
    rounds, converged = 0, False
    try:
        state = state.localCheckpoint(eager=True)
        frontier = state
        for r in range(1, max_rounds + 1):
            cand = (
                frontier.join(e.hint("merge"), frontier["id"] == e["src"])
                .groupBy("root", F.col("dst").alias("vid"))
                .agg(F.min(F.col("dist") + F.col("w")).alias("cand_dist"))
                .withColumnRenamed("vid", "id")
            )
            merged = (
                state.join(cand, ["root", "id"], "full_outer")
                .select(
                    "root",
                    "id",
                    F.least(
                        F.coalesce("dist", F.lit(2**62)),
                        F.coalesce("cand_dist", F.lit(2**62)),
                    ).alias("dist"),
                    (
                        F.col("cand_dist").isNotNull()
                        & (
                            F.col("dist").isNull()
                            | (F.col("cand_dist") < F.col("dist"))
                        )
                    ).alias("improved"),
                )
            )
            merged = ctx.truncate(merged, r)
            n_improved = (
                merged.where("improved").count()
            )  # the one driver action: materializes merged AND tests fixpoint
            ctx.record(merged, r, {"improved": n_improved})
            rounds = r
            if n_improved == 0:
                converged = True
                state = merged.select("root", "id", "dist")
                break
            frontier = merged.where("improved").select("root", "id", "dist")
            state = merged.select("root", "id", "dist")
        dist_out = state.localCheckpoint(eager=True)
        dist_out.count()
        return SsspResult(
            distances=dist_out,
            rounds=rounds,
            converged=converged,
            history=ctx.history,
        )
    finally:
        ctx.cleanup()
        e.unpersist()
