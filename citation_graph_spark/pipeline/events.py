"""Event-stream batch operators over the ``events`` table.

- ``sessionize`` — gap-based sessionization: a new session starts when the
  gap to the user's previous event exceeds ``gap_minutes``. The classic
  lag + conditional cumulative-sum window pair; entirely JVM-side.
- ``session_stats`` — one row per (user, session): bounds, event count,
  value sum.

Both have exact DuckDB oracle SQL (same window semantics) in
``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """events(user_id, ts, ...) → + session_id (1-based per user)."""
    by_user = W.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(by_user)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(is_new).over(by_user.rowsBetween(W.unboundedPreceding, 0)),
    )


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    s = sessionize(events, gap_minutes)
    return s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
