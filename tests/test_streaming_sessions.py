"""Stream/batch equivalence for the stateful sessionizer: the streamed
(append-mode, watermark-finalized) sessions must equal the batch
``session_stats`` output once the watermark passes every session's close."""

import datetime as dt

import pyspark.sql.functions as F

from citation_graph_spark.pipeline.events import session_stats
from citation_graph_spark.streaming.sessions import stream_sessionize

SCHEMA = "event_id long, user_id long, ts timestamp, value double"
T0 = dt.datetime(2024, 1, 1, 8, 0, 0)


def _ev(eid, uid, minutes, value):
    return (eid, uid, T0 + dt.timedelta(minutes=minutes), value)


# user 1: two sessions (gap 45 > 30 between minute 20 and 65)
# user 2: one session; user 3: single-event session
WAVE_1 = [
    _ev(1, 1, 0, 1.0), _ev(2, 1, 10, 2.0), _ev(3, 1, 20, 3.0),
    _ev(4, 2, 5, 10.0),
    _ev(5, 3, 7, 5.0),
]
WAVE_2 = [
    _ev(6, 1, 65, 4.0), _ev(7, 1, 80, 5.0),
    _ev(8, 2, 25, 20.0),
]
# sentinel: a far-future event for a throwaway user advances the event-time
# watermark past every real session's (last_ts + gap), flushing them all
SENTINEL = [_ev(99, 999, 10_000, 0.0)]


def test_stream_sessionize_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events_stream")
    # the file source needs the path to exist before the stream is defined
    spark.createDataFrame(WAVE_1, SCHEMA).coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream_sessionize(stream, gap_minutes=30)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .start()
    )
    try:
        # feed waves strictly in order so cross-batch data is never late
        q.processAllAvailable()
        for wave in (WAVE_2, SENTINEL):
            spark.createDataFrame(wave, SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            q.processAllAvailable()
        got = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["sum_value"])
            for r in spark.sql("SELECT * FROM sess_out").collect()
            if r["user_id"] != 999
        }
    finally:
        q.stop()

    batch = session_stats(
        spark.createDataFrame(WAVE_1 + WAVE_2, SCHEMA), gap_minutes=30
    )
    exp = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    assert got == exp
    # sanity: user 1 really split into two sessions
    assert sum(1 for g in exp if g[0] == 1) == 2


def test_stream_sessionize_mid_batch_close(spark, tmp_path):
    """A gap inside ONE micro-batch closes the first session immediately
    (no watermark needed) — the in-batch walk, not the timeout path."""
    src = str(tmp_path / "events_stream2")
    rows = [_ev(1, 7, 0, 1.0), _ev(2, 7, 100, 2.0)]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        stream_sessionize(stream, gap_minutes=30)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out2")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT * FROM sess_out2 ORDER BY session_start"
        ).collect()
    finally:
        q.stop()
    assert len(got) == 1  # first session closed in-batch; second still open
    assert got[0]["n_events"] == 1 and got[0]["sum_value"] == 1.0
    assert got[0]["session_start"] == got[0]["session_end"] == T0
