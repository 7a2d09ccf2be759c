"""Exclude-list text source.

Reference format (``/root/reference/src/citation_graph/paper.py:181-201``):
one ``{type}::{id}`` per line; lines starting with ``#`` are comments;
malformed lines are logged and skipped (never fail the run). Comment char
at ``paper.py:21``.

Spark version: ``spark.read.text`` → trim → drop comments/blanks → parse
with ``parse_id_string`` (NULL on malformed). Malformed rows are returned
separately so the caller can surface them as a metric (the reference's
``logger.warning`` analog) instead of silently dropping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from citation_graph_spark.functions.ids import parse_id_string

COMMENT_CHAR = "#"


def read_exclude_list(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Returns (parsed, malformed).

    ``parsed``: (id_type, raw_id, id) — id is the canonical ``type::id``.
    ``malformed``: (line) — non-comment lines that failed to parse.
    """
    lines = (
        spark.read.text(path)
        .select(F.trim("value").alias("line"))
        .where((F.length("line") > 0) & ~F.col("line").startswith(COMMENT_CHAR))
    )
    parsed_col = parse_id_string(F.col("line"))
    with_parse = lines.select("line", parsed_col.alias("p"))
    parsed = with_parse.where(F.col("p").isNotNull()).select(
        F.col("p.id_type").alias("id_type"),
        F.col("p.raw_id").alias("raw_id"),
        F.concat_ws("::", "p.id_type", "p.raw_id").alias("id"),
    )
    malformed = with_parse.where(F.col("p").isNull()).select("line")
    return parsed, malformed
