"""Range join (point ∈ interval) — an operator Spark has no native plan for.

``left.ts BETWEEN right.start AND right.end`` with only an inequality
predicate plans as BroadcastNestedLoopJoin — O(|L|·|R|) and
broadcast-bound, unusable at scale. The classic scale shape is interval
bucketing: quantize time into fixed buckets, explode each interval into
the buckets it covers (bounded by interval_length/bucket + 1 rows),
equi-join points to intervals on (key, bucket), then verify the exact
containment predicate. The equi-join shuffles on (key, bucket) — hash
partitioned, skew-handled by AQE like any other join — and the verify is
a residual filter, so Catalyst plans a plain SortMergeJoin/SHJ.

A point's bucket intersects an interval's bucket ONLY once (the point
lives in exactly one bucket), so the bucket join produces each matching
(point, interval) pair exactly once — no distinct needed.

Same family as ``operators/asof.py`` (backward as-of = the "latest prior"
special case); this is the containment/overlap general case, e.g. "which
ad exposures was this click inside", "which maintenance window did this
error land in".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """All (point, interval) pairs with equal ``on`` key and
    ``start <= ts < end`` (end exclusive; the containment check runs on
    the raw timestamps, so sub-second values are exact — bucketing only
    generates candidates and covers the end bucket unconditionally, one
    possibly-empty extra row, never a miss: ``unix_timestamp`` truncation
    moves values within their second and bucket boundaries are whole
    seconds, so truncated and true bucket ids agree).

    ``bucket_seconds`` trades explode factor vs join selectivity: each
    interval emits ``len/bucket + 1`` rows, so size it near the TYPICAL
    interval length. ``how='left'`` keeps unmatched points with NULL
    interval columns (one row per point, like a left join)."""
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    p = points.withColumn(
        "_b", F.floor(F.unix_timestamp(F.col(ts)) / bucket_seconds).cast("long")
    )
    iv = (
        intervals.where(F.col(end) > F.col(start))  # empty intervals match nothing
        .withColumn(
            "_b",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp(F.col(start)) / bucket_seconds).cast(
                        "long"
                    ),
                    F.floor(F.unix_timestamp(F.col(end)) / bucket_seconds).cast(
                        "long"
                    ),
                )
            ),
        )
    )
    contained = (F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end))
    if how == "inner":
        return p.join(iv, [on, "_b"]).where(contained).drop("_b")
    # left: inner-match first, then add back points with no match
    matched = p.join(iv, [on, "_b"]).where(contained).drop("_b")
    null_cols = [
        F.lit(None).cast(dict(iv.drop("_b").dtypes)[c]).alias(c)
        for c in iv.drop("_b").columns
        if c != on
    ]
    unmatched = p.drop("_b").join(
        matched.select(points.columns).distinct(),
        points.columns,
        "left_anti",
    ).select("*", *null_cols)
    return matched.unionByName(unmatched)
