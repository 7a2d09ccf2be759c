"""Streaming exact deduplication of a growing document corpus.

The batch pipeline dedups with a fingerprint groupBy
(``pipeline/dedup.py::exact_dedup``); in continuous ingestion the same
contract is "emit each previously-unseen fingerprint once". Built on
``dropDuplicatesWithinWatermark``: state holds one entry per fingerprint
and is evicted once the event-time watermark passes, so state size is
bounded by the duplicate-arrival horizon instead of growing with the
corpus forever — the knob a 100 TB ingest needs (an unbounded
``dropDuplicates`` would OOM the state store).

Semantics: the FIRST arrival of a fingerprint is emitted; any duplicate
arriving within ``watermark`` of it is suppressed. A duplicate arriving
later than the watermark horizon is emitted again (documented recall
bound of bounded state — downstream batch compaction removes stragglers,
the standard lambda tail).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from citation_graph_spark.pipeline.text import fingerprint


def dedup_stream(
    docs_stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """documents stream → stream of first-seen documents (by normalized
    text fingerprint), exactly one row per fingerprint within the
    watermark horizon. Append-mode sink ready."""
    with_fp = docs_stream.withColumn("fp", fingerprint(F.col(text_col)))
    return with_fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["fp"]
    )
