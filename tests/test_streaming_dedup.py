"""Streaming exact-dedup: first-seen emission per fingerprint, suppression
of in-horizon duplicates across micro-batches, stream==batch parity."""

import datetime as dt

import pyspark.sql.functions as F

from citation_graph_spark.pipeline.text import fingerprint
from citation_graph_spark.streaming.dedup import dedup_stream

SCHEMA = "doc_id long, ts timestamp, text string"
T0 = dt.datetime(2024, 1, 1, 8, 0, 0)


def _doc(i, minutes, text):
    return (i, T0 + dt.timedelta(minutes=minutes), text)


WAVE_1 = [
    _doc(0, 0, "alpha beta gamma"),
    _doc(1, 1, "ALPHA   beta gamma"),  # same fingerprint as 0 (normalized)
    _doc(2, 2, "totally different text"),
]
WAVE_2 = [
    _doc(3, 10, "alpha beta gamma"),  # cross-batch duplicate, in horizon
    _doc(4, 11, "third unique document"),
]


def test_stream_dedup_suppresses_cross_batch_duplicates(spark, tmp_path):
    src = str(tmp_path / "docs_stream")
    spark.createDataFrame(WAVE_1, SCHEMA).coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        dedup_stream(stream, watermark="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(WAVE_2, SCHEMA).coalesce(1).write.mode("append").parquet(
            src
        )
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM dedup_out").collect()
    finally:
        q.stop()

    # one row per distinct fingerprint, each the FIRST arrival
    assert sorted(r["doc_id"] for r in rows) == [0, 2, 4]

    # stream==batch: same fingerprint set as the batch exact-dedup
    batch = (
        spark.createDataFrame(WAVE_1 + WAVE_2, SCHEMA)
        .withColumn("fp", fingerprint(F.col("text")))
        .select("fp")
        .distinct()
    )
    assert {r["fp"] for r in rows} == {r["fp"] for r in batch.collect()}
