"""Pages-table source — Iceberg at scale, Parquet fallback.

BASELINE.json ``input_hint`` specifies an Iceberg table of Common-Crawl-
style pages ``(url, warc_ts, html, text, lang)``. This runtime has no
Iceberg catalog jar, so the loader tries the ``iceberg`` format first and
falls back to plain Parquet with the identical schema — the engine code
upstream is format-agnostic (everything is a DataFrame).

At 10^12 rows the Iceberg path gives partition pruning (e.g. by
``days(warc_ts)`` or url-host bucket), file skipping on ``url`` point
lookups (the reference's root-paper fetch, ``database.py:244-252``), and
snapshot isolation for resumable multi-job pipelines. The fallback keeps
tests runnable anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def read_pages(spark: SparkSession, path_or_table: str) -> DataFrame:
    """Load the pages table: Iceberg table name/path if the catalog is
    available, else a Parquet path with the same schema.

    Only the *format-unavailable* error falls through to Parquet (no
    Iceberg jar on the classpath). A genuine Iceberg misconfiguration —
    bad catalog name, auth failure, missing table — propagates instead of
    silently degrading to an empty/missing Parquet read."""
    try:
        return spark.read.format("iceberg").load(path_or_table)
    except Exception as exc:
        msg = str(exc)
        unavailable = (
            "DATA_SOURCE_NOT_FOUND" in msg
            or "Failed to find the data source" in msg
            or "ClassNotFoundException" in msg
        )
        if not unavailable:
            raise
        import logging

        logging.getLogger(__name__).info(
            "iceberg format unavailable; falling back to parquet for %s",
            path_or_table,
        )
        return spark.read.schema(PAGES_SCHEMA).parquet(path_or_table)


def root_page(pages: DataFrame, url: str) -> DataFrame:
    """Point lookup of one page (S1). Under Iceberg/Parquet the equality
    predicate reaches the scan (PushedFilters) — file/row-group skipping
    does the work, no full scan."""
    return pages.where(F.col("url") == url)


def write_pages(
    pages: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Persist a pages table (Parquet fallback layout). ``partition_by``
    gives hive-style directory partitioning — a predicate on those columns
    prunes whole directories at plan time (PartitionFilters in the scan),
    the Parquet analog of Iceberg's partition pruning. At scale: Iceberg
    ``writeTo(...).partitionedBy(days(warc_ts), bucket(1024, url))``."""
    writer = pages.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
