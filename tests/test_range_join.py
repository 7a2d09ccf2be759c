"""Bucketed point-in-interval range join vs a brute-force python oracle —
including sub-second timestamps, bucket-boundary edges, intervals longer
than a bucket, empty intervals, and the left-join variant."""

import datetime as dt

import pyspark.sql.functions as F

from citation_graph_spark.operators.range_join import point_in_interval_join

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _t(seconds):
    return T0 + dt.timedelta(seconds=seconds)


POINTS = [
    # (pid, key, ts_seconds) — fractional seconds on purpose
    (1, 10, 5.25),
    (2, 10, 3600.0),  # exactly on a bucket boundary
    (3, 10, 3599.999),
    (4, 20, 100.5),
    (5, 20, 7000.0),
    (6, 30, 50.0),  # key with no intervals
]
INTERVALS = [
    # (iid, key, start_seconds, end_seconds)
    (100, 10, 0.0, 10.5),          # contains p1
    (101, 10, 3590.5, 3605.25),    # spans the bucket boundary: p2 AND p3
    (102, 10, 3600.0, 3600.0),     # empty: matches nothing
    (103, 20, 90.0, 7200.0),       # longer than a bucket: p4 and p5
    (104, 20, 100.5, 101.0),       # starts exactly at p4 (inclusive)
    (105, 20, 6000.0, 7000.0),     # ends exactly at p5 (exclusive): no match
]


def _frames(spark):
    points = spark.createDataFrame(
        [(p, k, _t(s)) for p, k, s in POINTS], "pid long, key long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(i, k, _t(s), _t(e)) for i, k, s, e in INTERVALS],
        "iid long, key long, start timestamp, end timestamp",
    )
    return points, intervals


def _oracle():
    return {
        (p, i)
        for p, k, s in POINTS
        for i, ik, st, en in INTERVALS
        if ik == k and st <= s < en
    }


def test_point_in_interval_matches_bruteforce(spark):
    points, intervals = _frames(spark)
    for bucket in (60, 3600, 7):  # also a bucket that divides nothing evenly
        got = {
            (r["pid"], r["iid"])
            for r in point_in_interval_join(
                points, intervals, on="key", bucket_seconds=bucket
            ).collect()
        }
        assert got == _oracle(), bucket


def test_point_in_interval_left_keeps_unmatched(spark):
    points, intervals = _frames(spark)
    rows = point_in_interval_join(
        points, intervals, on="key", bucket_seconds=60, how="left"
    ).collect()
    got = {(r["pid"], r["iid"]) for r in rows}
    matched = _oracle()
    unmatched_pids = {p for p, _k, _s in POINTS} - {p for p, _i in matched}
    assert got == matched | {(p, None) for p in unmatched_pids}
    # exactly one row per unmatched point
    assert sum(1 for r in rows if r["iid"] is None) == len(unmatched_pids)


def test_point_in_interval_plan_is_equi_join(spark):
    """The scale property: the bucketed formulation plans a hash/sort-merge
    EQUI-join, never BroadcastNestedLoopJoin."""
    points, intervals = _frames(spark)
    out = point_in_interval_join(points, intervals, on="key", bucket_seconds=60)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
