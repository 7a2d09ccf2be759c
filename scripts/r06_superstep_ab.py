"""Round-6 superstep A/B: candidate physical shapes for the PageRank
superstep, interleaved trials, min per arm (guide §1/§2). Also checks
numeric parity of every variant against V0 after a fixed 5 iterations.

Variants:
  v0_current      : lazy localCheckpoint + merge-SMJ join1 + merge-SMJ left join2
  v1_eager        : like v0 but eager localCheckpoint (does partitioning survive?)
  v2_union_agg    : join1 + partial-agg, then UNION state and aggregate by id
                    (no second join, no sorts)
  v3_shj          : like v0 but shuffle_hash hints on both joins
  v4_union_shj    : v2 with shuffle_hash hint on join1
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from citation_graph_spark.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_V = int(os.environ.get("AB_VERTICES", "800000"))
N_E = int(os.environ.get("AB_EDGES", "8000000"))
ITERS = int(os.environ.get("AB_ITERS", "5"))
ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))


def main() -> int:
    spark = get_spark(app_name="r06-superstep-ab", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    sc = spark.sparkContext
    from citation_graph_spark import datagen
    from citation_graph_spark.operators.prepared import PreparedGraph

    edges = datagen.zipf_edges(spark, N_V, N_E, seed=42).persist()
    edges.count()
    pg = PreparedGraph(edges)
    w_edges = pg.weighted_edges(0)
    flagged = pg.dangling_flagged()
    n = pg.n_vertices()
    alpha, base0 = 0.85, None

    def init_state():
        st = flagged.select("id", F.lit(1.0 / n).alias("rank"), "is_dangling")
        st = st.localCheckpoint(eager=True)
        dm = st.where("is_dangling").agg(F.sum("rank")).first()[0] or 0.0
        return st, dm

    def step_join(state, dm, eager, hint1, hint2):
        contribs = (
            state.select("id", "rank")
            .join(w_edges.hint(hint1), F.col("id") == w_edges.src)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
        )
        base = (1.0 - alpha) / n + alpha * dm / n
        new_state = (
            state.join(contribs.hint(hint2), state.id == contribs.dst, "left")
            .select(
                state.id.alias("id"),
                (F.lit(base) + F.lit(alpha) * F.coalesce("contrib", F.lit(0.0))).alias("new_rank"),
                state.rank.alias("old_rank"),
                state.is_dangling.alias("is_dangling"),
            )
            .select(
                "id", F.col("new_rank").alias("rank"), "is_dangling",
                F.abs(F.col("new_rank") - F.col("old_rank")).alias("_delta"),
            )
        )
        new_state = new_state.localCheckpoint(eager=eager)
        row = new_state.agg(
            F.sum("_delta").alias("delta"),
            F.sum(F.when(F.col("is_dangling"), F.col("rank"))).alias("dm"),
        ).first()
        return new_state.drop("_delta"), float(row["dm"] or 0.0)

    def step_union(state, dm, hint1):
        per_edge = (
            state.select("id", "rank")
            .join(w_edges.hint(hint1), F.col("id") == w_edges.src)
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") * F.col("w")).alias("c"),
                F.lit(None).cast("double").alias("old_rank"),
                F.lit(None).cast("boolean").alias("is_dangling"),
            )
        )
        base_rows = state.select(
            "id",
            F.lit(None).cast("double").alias("c"),
            F.col("rank").alias("old_rank"),
            "is_dangling",
        )
        base = (1.0 - alpha) / n + alpha * dm / n
        merged = (
            per_edge.unionByName(base_rows)
            .groupBy("id")
            .agg(
                F.sum("c").alias("contrib"),
                F.max("old_rank").alias("old_rank"),
                F.max("is_dangling").alias("is_dangling"),
            )
            .select(
                "id",
                (F.lit(base) + F.lit(alpha) * F.coalesce("contrib", F.lit(0.0))).alias("rank"),
                "is_dangling",
                F.abs(
                    (F.lit(base) + F.lit(alpha) * F.coalesce("contrib", F.lit(0.0)))
                    - F.col("old_rank")
                ).alias("_delta"),
            )
        )
        new_state = merged.localCheckpoint(eager=False)
        row = new_state.agg(
            F.sum("_delta").alias("delta"),
            F.sum(F.when(F.col("is_dangling"), F.col("rank"))).alias("dm"),
        ).first()
        return new_state.drop("_delta"), float(row["dm"] or 0.0)

    def run(variant):
        state, dm = init_state()
        prev = None
        t0 = time.time()
        for _ in range(ITERS):
            if variant == "v0_current":
                state2, dm = step_join(state, dm, False, "merge", "merge")
            elif variant == "v1_eager":
                state2, dm = step_join(state, dm, True, "merge", "merge")
            elif variant == "v2_union_agg":
                state2, dm = step_union(state, dm, "merge")
            elif variant == "v3_shj":
                state2, dm = step_join(state, dm, False, "shuffle_hash", "shuffle_hash")
            elif variant == "v4_union_shj":
                state2, dm = step_union(state, dm, "shuffle_hash")
            else:
                raise ValueError(variant)
            if prev is not None:
                try:
                    prev.unpersist()
                except Exception:
                    pass
            prev = state
            state = state2
        wall = round(time.time() - t0, 3)
        return wall, state

    variants = ["v0_current", "v1_eager", "v2_union_agg", "v3_shj", "v4_union_shj"]
    walls = {v: [] for v in variants}
    finals = {}
    for r in range(ROUNDS):
        for v in variants:
            sc.setJobDescription(f"{v} round {r}")
            w, state = run(v)
            walls[v].append(w)
            if v not in finals:
                finals[v] = state.select("id", "rank").persist()
                finals[v].count()
            else:
                try:
                    state.unpersist()
                except Exception:
                    pass
            sc.setJobDescription(None)
            print(f"  {v} round {r}: {w}s", flush=True)

    # numeric parity vs v0
    parity = {}
    ref = finals["v0_current"]
    for v in variants[1:]:
        d = (
            ref.alias("a").join(finals[v].alias("b"), "id")
            .agg(F.max(F.abs(F.col("a.rank") - F.col("b.rank"))).alias("m"))
            .first()["m"]
        )
        parity[v] = float(d or 0.0)
    out = {
        "walls": walls,
        "min": {v: min(w) for v, w in walls.items()},
        "max_abs_diff_vs_v0": parity,
        "iters": ITERS,
        "n_edges": N_E,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
