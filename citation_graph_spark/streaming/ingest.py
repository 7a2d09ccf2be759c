"""Structured-Streaming ingestion of a growing pages corpus.

The reference is a batch crawler with an incremental checkpoint-after-
each-request flow (``cache_manager.py:221-237``) — its streaming analog is
continuous ingestion: new page files land (the crawl), the extractor runs
per micro-batch, and the edge table grows exactly-once.

- ``stream_edges`` — ``readStream`` over a pages directory → the same
  vectorized ``extract_links`` UDF → ``foreachBatch`` appending deduped
  edges partitioned by ``src`` bucket; foreachBatch + overwrite-by-batch-id
  directory layout gives exactly-once under retries (each epoch writes
  ``batch=<epoch>`` atomically).
- ``crawl_stats_stream`` — watermarked event-time windows over ``warc_ts``
  counting pages/links per lang per window; the reference's per-request
  progress logging (``traverser.py:163-222``), made a real-time aggregate.
  Late pages beyond the watermark are dropped (documented, testable).

Tested with the file source + ``processAllAvailable`` (synchronous drain),
per the Structured Streaming micro-batch model.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from citation_graph_spark.extract import extract_links
from citation_graph_spark.sources.pages import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 16) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_edges(
    pages_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    num_buckets: int = 64,
) -> StreamingQuery:
    """pages stream → exactly-once edge-table appends.

    Each micro-batch: extract → dedup within batch → write to
    ``<out>/batch=<epoch>/`` with overwrite (idempotent under epoch
    retries). Readers see the union via ``spark.read.parquet(out_dir)``.
    """
    edges = pages_stream.select(
        F.col("url").alias("src"),
        F.posexplode(extract_links(F.col("html"))).alias("pos", "dst"),
    ).select("src", "dst", "pos")

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        deduped = batch_df.groupBy("src", "dst").agg(F.min("pos").alias("pos"))
        (
            deduped.withColumn(
                "bucket", F.pmod(F.xxhash64("src"), F.lit(num_buckets)).cast("int")
            )
            .repartition("bucket")
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"batch={epoch_id}"))
        )

    return (
        edges.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def crawl_stats_stream(
    pages_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked windowed aggregate: pages + extracted links per lang per
    ``warc_ts`` window. Start with ``.writeStream.format('memory')`` (tests)
    or a real sink; append mode emits a window once the watermark passes."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .select(
            "warc_ts",
            "lang",
            F.size(extract_links(F.col("html"))).alias("n_links"),
        )
        .groupBy(F.window("warc_ts", window), "lang")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum("n_links").alias("n_links"),
        )
    )
