import datetime

from citation_graph_spark.operators.asof import as_of_join


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m)


def test_as_of_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(5)), (2, 100, _ts(10)), (3, 100, _ts(2)), (4, 200, _ts(7))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, _ts(5), 50.0), (100, _ts(8), 80.0), (200, _ts(9), 90.0)],
        "user_id long, ts timestamp, v double",
    )
    out = {
        r["event_id"]: r["v_asof"]
        for r in as_of_join(left, right, ts="ts", by="user_id", value_cols=["v"]).collect()
    }
    assert out[1] == 50.0  # equal ts matches (inclusive)
    assert out[2] == 80.0  # latest preceding
    assert out[3] is None  # nothing before
    assert out[4] is None  # other key, right row is later


def test_as_of_join_preserves_left_rows(spark):
    left = spark.createDataFrame(
        [(i, i % 3, _ts(i)) for i in range(30)], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(0, _ts(4), 1.0), (1, _ts(9), 2.0)], "user_id long, ts timestamp, v double"
    )
    out = as_of_join(left, right, ts="ts", by="user_id", value_cols=["v"])
    assert out.count() == 30
    assert set(out.columns) == {"event_id", "user_id", "ts", "v_asof"}
