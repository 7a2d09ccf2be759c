"""PageRank as join-aggregate supersteps — the engine's benchmark workload.

Semantics match the standard power iteration with damping ``alpha``,
uniform teleport, and uniform redistribution of dangling mass each
iteration (NetworkX semantics; the reference's citation counts are the
degree special case of this, ``src/citation_graph/traverser.py:109-116``):

    r'(v) = (1-a)/n + a * ( sum_{u->v} r(u)/outdeg(u)  +  dm/n )
    dm    = sum of r(u) over dangling u (no out-edges)

Converges when the L1 delta ``sum |r' - r|`` drops below ``tol`` (1e-6 per
the north rule).

Scale shape per iteration (what runs on 1000 executors):
- ``ranks ⋈ edges`` on ``src`` — the big side (edges) is pre-weighted,
  pre-partitioned on ``src`` and persisted ONCE; only the small rank frame
  shuffles each superstep. AQE skew-join splits hub-src partitions; an
  explicit ``salt_factor`` replicates rank rows across salted edge splits
  for deterministic hub handling.
- ``groupBy(dst).sum()`` — partial (map-side) aggregation bounds a hub
  dst's shuffle rows by the partition count, the built-in equivalent of
  two-phase salted aggregation.
- one driver-side scalar action per iteration reads BOTH the L1 delta and
  the next iteration's dangling mass from the already-materialized state —
  no extra pass.
- plan lineage is truncated per iteration (localCheckpoint), durable
  Parquet checkpoints + manifest every ``durable_every`` iterations; a
  killed run resumes from the newest valid manifest (metrics carry the
  dangling mass, so resume is exact).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, functions as F

from citation_graph_spark.operators.prepared import PreparedGraph, superstep_contribs
from citation_graph_spark.operators.superstep import SuperstepContext
from citation_graph_spark.sources.checkpoint import CheckpointManager


@dataclass
class PageRankResult:
    ranks: DataFrame  # (id, rank)
    iterations: int
    delta: float
    converged: bool
    history: list[dict[str, Any]] = field(default_factory=list)


def pagerank(
    edges: DataFrame | None = None,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    durable_every: int = 5,
    salt_factor: int | str = 0,
    resume: bool = True,
    num_partitions: int | None = None,
    prepared: PreparedGraph | None = None,
    weight_col: str | None = None,
) -> PageRankResult:
    """Run PageRank on an ``(src, dst, ...)`` edge DataFrame.

    ``weight_col``: optional strictly-positive edge-weight column —
    contributions become r(u)·weight(u,v)/Σ_w(u) instead of
    r(u)/outdeg(u) (weighted PageRank; identical superstep plan, only
    the per-edge ``w`` in the static cache changes). Ignored when
    ``prepared`` is passed (the PreparedGraph's own ``weight_col``
    governs, since its cache is already built).

    ``salt_factor``: 0/1 = unsalted; N>1 = split each src's edges over N
    salted join partitions (hub skew the cached edge side has, which AQE
    cannot split — measured 1.57× on a 15%-hub graph, BENCH.md);
    ``"auto"`` = the deterministic skew probe proposes a factor and a
    measured 2-superstep A/B validates it before committing
    (``PreparedGraph.resolve_salt_factor`` — auto can never pick a layout
    it just measured as slower than unsalted). The checkpoint manifest
    records the RESOLVED integer, and a resumed ``"auto"`` run ADOPTS
    that recorded factor instead of re-measuring (measurement is
    timing-dependent; adoption keeps resume deterministic and exact).

    ``prepared``: pass a :class:`PreparedGraph` to reuse the weighted
    sorted edge cache (and vertex/dangling tables) across repeated
    algorithm calls on the same graph — the static setup then runs once,
    outside this call's wall. Without it, a private one is built and
    released before returning (single-call behavior unchanged)."""
    owns_prepared = prepared is None
    if prepared is None:
        if edges is None:
            raise ValueError("pass either edges or prepared")
        prepared = PreparedGraph(edges, num_partitions, weight_col=weight_col)
    else:
        edges = prepared.edges
        weight_col = prepared.weight_col
    spark = edges.sparkSession
    if salt_factor == "auto":
        salt_factor = _resolve_auto_salt(
            spark, prepared, checkpoint_dir if resume else None,
            alpha=alpha, tol=tol, max_iter=max_iter,
        )

    ckpt = None
    if checkpoint_dir is not None:
        ckpt = CheckpointManager(
            spark,
            checkpoint_dir,
            args={
                "algorithm": "pagerank",
                "alpha": alpha,
                "tol": tol,
                "max_iter": max_iter,
                "salt_factor": salt_factor,
                **({"weight_col": weight_col} if weight_col else {}),
            },
        )
    ctx = SuperstepContext(checkpoint=ckpt, durable_every=durable_every)

    try:
        return _pagerank_loop(
            prepared, ctx, ckpt, alpha, tol, max_iter, salt_factor, resume,
            checkpoint_dir,
        )
    finally:
        if owns_prepared:
            prepared.unpersist()


def personalized_pagerank(
    edges: DataFrame | None = None,
    sources: DataFrame | None = None,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    durable_every: int = 5,
    salt_factor: int = 0,
    resume: bool = True,
    num_partitions: int | None = None,
    prepared: PreparedGraph | None = None,
) -> PageRankResult:
    """Personalized PageRank: random walk with restart to a source set.

    The reference's whole program is rooted expansion from one seed paper
    (``src/citation_graph/traverser.py:132-145`` walks outward from
    ``start_paper``); PPR is the principled scoring of that rooted view —
    relevance TO the seed set rather than global importance:

        r'(v) = ((1-a) + a*dm) * p(v) + a * Σ_{u→v} r(u)/outdeg(u)

    with ``p`` uniform over ``sources ∩ vertices`` (ns of them, p(v) =
    1/ns), r0 = p, dangling mass restarting at the sources, and the same
    L1-delta stopping rule as :func:`pagerank`. The superstep is the
    IDENTICAL plan shape (shared ``superstep_contribs``: merge-hinted SMJ
    vs the persisted src-sorted edge cache, map-side partial aggregation,
    one scalar action per iteration); only the per-vertex restart term
    differs, a branchless CASE over a broadcast-joined source flag.

    ``sources``: DataFrame with an ``id`` column (kept declarative —
    typically tiny vs the graph, so the flag join broadcasts). Ids not in
    the graph are ignored; ns counts only matched sources.
    ``salt_factor`` is the explicit integer knob (no "auto" here — the
    measured A/B would re-time what the pagerank study already settled
    for the shared superstep body)."""
    if sources is None:
        raise ValueError("personalized_pagerank requires a sources DataFrame")
    owns_prepared = prepared is None
    if prepared is None:
        if edges is None:
            raise ValueError("pass either edges or prepared")
        prepared = PreparedGraph(edges, num_partitions)
    else:
        edges = prepared.edges
    spark = edges.sparkSession

    ckpt = None
    if checkpoint_dir is not None:
        # fingerprint the source set into the manifest args so a resume
        # against a checkpoint written for a DIFFERENT seed set is rejected
        # by the args-compat check (order-independent sum of id hashes)
        src_fp = sources.select(
            F.sum(F.xxhash64(F.col("id").cast("string"))).alias("fp")
        ).first()["fp"]
        ckpt = CheckpointManager(
            spark,
            checkpoint_dir,
            args={
                "algorithm": "personalized_pagerank",
                "alpha": alpha,
                "tol": tol,
                "max_iter": max_iter,
                "salt_factor": salt_factor,
                "sources_fp": src_fp,
            },
        )
    ctx = SuperstepContext(checkpoint=ckpt, durable_every=durable_every)
    try:
        return _ppr_loop(
            prepared, ctx, ckpt, sources, alpha, tol, max_iter, salt_factor,
            resume, checkpoint_dir,
        )
    finally:
        if owns_prepared:
            prepared.unpersist()


def _ppr_loop(
    prepared: PreparedGraph,
    ctx: SuperstepContext,
    ckpt,
    sources: DataFrame,
    alpha: float,
    tol: float,
    max_iter: int,
    salt_factor: int,
    resume: bool,
    checkpoint_dir,
) -> PageRankResult:
    import time as _time

    start_iter = 0
    dangling_mass = None
    state = None
    resumed_delta = None
    if ckpt is not None and resume:
        latest = ckpt.latest()
        if latest is not None:
            it, state_df, manifest = latest
            from citation_graph_spark.sources.checkpoint import resume_compatible

            if resume_compatible(manifest.get("args"), ckpt.args):
                state = state_df
                start_iter = it + 1
                dangling_mass = float(manifest["metrics"]["dangling_mass"])
                prev_delta = manifest["metrics"].get("delta")
                if prev_delta is not None:
                    resumed_delta = float(prev_delta)
                    if resumed_delta < tol:
                        return PageRankResult(
                            state.select("id", "rank"), it, resumed_delta, True, []
                        )

    w_edges = prepared.weighted_edges(salt_factor)
    flagged = prepared.dangling_flagged()
    if prepared.n_vertices() == 0:
        empty = flagged.select(F.col("id"), F.lit(0.0).alias("rank"))
        return PageRankResult(empty, 0, 0.0, True, [])

    # source flag joined once into the static vertex table (broadcast: the
    # seed set is small by construction), then carried through the state
    src_flagged = flagged.join(
        F.broadcast(sources.select(F.col("id")).distinct().withColumn(
            "is_source", F.lit(True)
        )),
        "id",
        "left",
    ).select(
        "id", "is_dangling", F.coalesce("is_source", F.lit(False)).alias("is_source")
    )
    ns = src_flagged.where("is_source").count()
    if ns == 0:
        raise ValueError("no source id matches a graph vertex")

    if state is None:
        state = src_flagged.select(
            "id",
            F.when(F.col("is_source"), F.lit(1.0 / ns)).otherwise(0.0).alias("rank"),
            "is_dangling",
            "is_source",
        )
        state = ctx.truncate(state, 0)
        dangling_mass = (
            state.where("is_dangling").agg(F.sum("rank")).first()[0] or 0.0
        )
        state = ctx.record(state, 0, {"dangling_mass": dangling_mass, "delta": None})
        start_iter = 1

    delta = float("inf") if resumed_delta is None else resumed_delta
    ran = False
    it = start_iter - 1
    for it in range(start_iter, max_iter + 1):
        ran = True
        _t_iter = _time.time()
        contribs = superstep_contribs(state, w_edges, salt_factor)
        restart = (1.0 - alpha) + alpha * dangling_mass  # total mass restarting
        new_state = (
            state.join(contribs.hint("merge"), state.id == contribs.dst, "left")
            .select(
                state.id.alias("id"),
                (
                    F.when(state.is_source, F.lit(restart / ns)).otherwise(0.0)
                    + F.lit(alpha) * F.coalesce("contrib", F.lit(0.0))
                ).alias("new_rank"),
                state.rank.alias("old_rank"),
                state.is_dangling.alias("is_dangling"),
                state.is_source.alias("is_source"),
            )
            .select(
                "id",
                F.col("new_rank").alias("rank"),
                "is_dangling",
                "is_source",
                F.abs(F.col("new_rank") - F.col("old_rank")).alias("_delta"),
            )
        )
        new_state = ctx.truncate(new_state, it)
        row = new_state.agg(
            F.sum("_delta").alias("delta"),
            F.sum(F.when(F.col("is_dangling"), F.col("rank"))).alias("dm"),
        ).first()
        delta = float(row["delta"] or 0.0)
        dangling_mass = float(row["dm"] or 0.0)
        state = new_state.drop("_delta")
        state = ctx.record(
            state,
            it,
            {
                "dangling_mass": dangling_mass,
                "delta": delta,
                "seconds": round(_time.time() - _t_iter, 3),
            },
        )
        if delta < tol:
            break

    converged = delta < tol
    if ckpt is not None and ran:
        state = ctx.finish(
            state, it, {"dangling_mass": dangling_mass, "delta": delta, "final": converged}
        )
    return PageRankResult(state.select("id", "rank"), it, delta, converged, ctx.history)


def _resolve_auto_salt(
    spark, prepared: PreparedGraph, checkpoint_dir: str | None, **call_args
) -> int:
    """Resolve ``salt_factor="auto"`` for one pagerank call.

    A resumable checkpoint whose OTHER args match this call ADOPTS the
    manifest's recorded integer factor: the measured A/B inside
    ``resolve_salt_factor`` is timing-dependent, and a re-measurement
    that resolved differently would fail the args-compat check and
    silently discard the checkpoint. Only a fresh run (no compatible
    manifest) probes + measures."""
    if checkpoint_dir is not None:
        from citation_graph_spark.sources.checkpoint import (
            CheckpointManager,
            resume_compatible,
        )

        manifest = CheckpointManager(spark, checkpoint_dir).peek_latest_manifest()
        if manifest is not None:
            margs = dict(manifest.get("args") or {})
            recorded = margs.get("salt_factor")
            want = {"algorithm": "pagerank", **call_args, "salt_factor": recorded}
            if isinstance(recorded, int) and resume_compatible(margs, want):
                return recorded
    return prepared.resolve_salt_factor()


def _pagerank_loop(
    prepared: PreparedGraph,
    ctx: SuperstepContext,
    ckpt,
    alpha: float,
    tol: float,
    max_iter: int,
    salt_factor: int,
    resume: bool,
    checkpoint_dir,
) -> PageRankResult:
    # --- resume check first: a fully-converged checkpoint returns before
    # any static table is built -----------------------------------------------
    start_iter = 0
    dangling_mass = None
    state = None
    resumed_delta = None
    if ckpt is not None and resume:
        latest = ckpt.latest()
        if latest is not None:
            it, state_df, manifest = latest
            # Validate ALL recorded hyperparameters (alpha, salt_factor, …),
            # not just the algorithm name — resuming a checkpoint written
            # under different parameters would blend two different fixpoints.
            # max_iter/tol are continuation knobs and may differ.
            from citation_graph_spark.sources.checkpoint import resume_compatible

            if resume_compatible(manifest.get("args"), ckpt.args):
                state = state_df
                start_iter = it + 1
                dangling_mass = float(manifest["metrics"]["dangling_mass"])
                prev_delta = manifest["metrics"].get("delta")
                if prev_delta is not None:
                    # seed the residual: if the loop below runs zero
                    # iterations (start_iter > max_iter), the true recorded
                    # delta is reported instead of inf, and the manifest is
                    # not rewritten (see the `ran` guard at the bottom)
                    resumed_delta = float(prev_delta)
                    if resumed_delta < tol:
                        # Already converged — nothing to recompute.
                        return PageRankResult(
                            state.select("id", "rank"), it, resumed_delta, True, []
                        )
            else:
                import warnings

                warnings.warn(
                    f"checkpoint at {checkpoint_dir} was written with different "
                    f"args ({manifest.get('args')}) than this call ({ckpt.args}); "
                    "ignoring it and starting fresh",
                    RuntimeWarning,
                    stacklevel=2,
                )

    # --- static per-run tables (PreparedGraph: built once, persisted,
    # shared across algorithm calls when the caller passed one) --------------
    w_edges = prepared.weighted_edges(salt_factor)
    n = prepared.n_vertices()
    if n == 0:
        empty = prepared.dangling_flagged().select(F.col("id"), F.lit(0.0).alias("rank"))
        return PageRankResult(empty, 0, 0.0, True, [])
    flagged = prepared.dangling_flagged()

    if state is None:
        state = flagged.select(
            "id", F.lit(1.0 / n).alias("rank"), "is_dangling"
        )
        state = ctx.truncate(state, 0)
        dangling_mass = (
            state.where("is_dangling").agg(F.sum("rank")).first()[0] or 0.0
        )
        state = ctx.record(state, 0, {"dangling_mass": dangling_mass, "delta": None})
        start_iter = 1

    import time as _time

    delta = float("inf") if resumed_delta is None else resumed_delta
    ran = False
    it = start_iter - 1
    for it in range(start_iter, max_iter + 1):
        ran = True
        _t_iter = _time.time()
        # the join-agg superstep body lives in prepared.superstep_contribs —
        # shared with the measured salt A/B so the probe times this exact plan
        contribs = superstep_contribs(state, w_edges, salt_factor)

        base = (1.0 - alpha) / n + alpha * dangling_mass / n
        new_state = (
            state.join(contribs.hint("merge"), state.id == contribs.dst, "left")
            .select(
                state.id.alias("id"),
                (F.lit(base) + F.lit(alpha) * F.coalesce("contrib", F.lit(0.0))).alias(
                    "new_rank"
                ),
                state.rank.alias("old_rank"),
                state.is_dangling.alias("is_dangling"),
            )
            .select(
                "id",
                F.col("new_rank").alias("rank"),
                "is_dangling",
                F.abs(F.col("new_rank") - F.col("old_rank")).alias("_delta"),
            )
        )
        new_state = ctx.truncate(new_state, it)
        row = new_state.agg(
            F.sum("_delta").alias("delta"),
            F.sum(F.when(F.col("is_dangling"), F.col("rank"))).alias("dm"),
        ).first()
        delta = float(row["delta"] or 0.0)
        dangling_mass = float(row["dm"] or 0.0)
        state = new_state.drop("_delta")
        state = ctx.record(
            state,
            it,
            {
                "dangling_mass": dangling_mass,
                "delta": delta,
                "seconds": round(_time.time() - _t_iter, 3),
            },
        )
        if delta < tol:
            break

    converged = delta < tol
    if ckpt is not None and ran:
        # Durably record the last state (full schema, so resume still works)
        # even when it fell between durable_every boundaries. Skipped when
        # zero iterations ran — rewriting the manifest would clobber the
        # recorded true residual (and delta=inf is not valid JSON).
        state = ctx.finish(
            state, it, {"dangling_mass": dangling_mass, "delta": delta, "final": converged}
        )
    return PageRankResult(state.select("id", "rank"), it, delta, converged, ctx.history)
