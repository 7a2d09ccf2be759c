"""As-of join — Spark has no native one; composed from union + window.

``as_of_join(left, right, ...)``: for every left row, attach the right row
with the greatest ``ts`` ≤ the left row's ``ts`` within the same ``by``
key (the standard backward-looking as-of).

Construction (scale shape): tag the two inputs, union them, and take a
running ``last(..., ignorenulls)`` over a (by, ts)-ordered window — one
shuffle on ``by``, one sort, no per-key Python, no range explosion. Right-
side ties on (by, ts) must be pre-deduplicated by the caller (one row per
(by, ts)) for deterministic output — same contract as DuckDB's ASOF JOIN,
which this is verified against in ``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    ts: str,
    by: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join (inclusive): left rows + latest right values.

    ``value_cols``: right-side columns to carry (output name +``suffix``).
    Left rows with no preceding right row get NULLs (left-join semantics).
    """
    lcols = left.columns
    ltypes = {f.name: f.dataType for f in left.schema.fields}
    rtypes = {f.name: f.dataType for f in right.schema.fields}
    tagged_left = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(rtypes[c]).alias(f"_r_{c}") for c in value_cols],
    )
    tagged_right = right.select(
        *[
            F.col(c) if c in (ts, by) else F.lit(None).cast(ltypes[c]).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    union = tagged_left.unionByName(tagged_right)
    # right rows sort BEFORE left rows at equal ts (_side 0 < 1) so the
    # inclusive (ts >= right.ts) semantics hold.
    w = (
        W.partitionBy(by)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = union.select(
        *lcols,
        "_side",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return filled.where(F.col("_side") == 1).drop("_side")
