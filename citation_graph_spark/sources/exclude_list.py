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


def read_exclude_list(
    spark: SparkSession, path: str, allow_bare: bool = False
) -> tuple[DataFrame, DataFrame]:
    """Returns (parsed, malformed).

    ``parsed``: (id_type, raw_id, id) — id is the canonical ``type::id``.
    ``malformed``: (line) — non-comment lines that failed to parse.

    ``allow_bare`` widens the id space beyond the reference's four
    ``type::id`` forms: a line that *looks like a url* (``scheme://…``,
    with an optional explicit ``url::`` prefix) is kept as
    ``(id_type='url', raw_id=url, id=url)``. This is how a url-vertex
    graph (vertex id == page url) is addressed — the reference never
    needed it because its vertex space IS its id space
    (``paper.py:146-179``). Lines that are neither canonical nor
    url-shaped (a typo like ``dio::123``) still flow to ``malformed`` so
    the caller's warning channel stays live — keeping them verbatim would
    silently produce never-matching exclude entries.

    BREAKING CHANGE (round 3): earlier versions kept ANY bare line as a
    url exclude entry; now a line must match ``scheme://…`` — with an
    optional ``url::`` prefix in front of the scheme (``url::`` does NOT
    waive the scheme requirement: ``url::example.com/page`` is
    malformed). Scheme-less entries like
    ``example.com/page`` previously matched nothing downstream anyway in
    a url-vertex graph (vertex ids carry schemes), but they now land in
    ``malformed`` instead of ``parsed`` — operators with existing exclude
    files should re-audit: every line reported malformed was previously a
    silent no-op entry. To keep a scheme-less id space, prefix entries
    with ``url::`` is NOT sufficient (the scheme check still applies);
    extend ``parse_id_string``'s id types instead."""
    lines = (
        spark.read.text(path)
        .select(F.trim("value").alias("line"))
        .where((F.length("line") > 0) & ~F.col("line").startswith(COMMENT_CHAR))
    )
    parsed_col = parse_id_string(F.col("line"))
    with_parse = lines.select("line", parsed_col.alias("p"))
    canonical = F.concat_ws("::", "p.id_type", "p.raw_id")
    if allow_bare:
        # strip an explicit "url::" prefix ("url" is not in ID_TYPES, so the
        # canonical parser leaves it alone), then require a scheme://
        bare = F.when(
            F.col("line").startswith("url::"),
            F.expr("substring(line, 6)"),
        ).otherwise(F.col("line"))
        with_bare = with_parse.withColumn(
            "bare",
            F.when(bare.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), bare),
        )
        parsed = with_bare.where(
            F.col("p").isNotNull() | F.col("bare").isNotNull()
        ).select(
            F.coalesce(F.col("p.id_type"), F.lit("url")).alias("id_type"),
            F.coalesce(F.col("p.raw_id"), F.col("bare")).alias("raw_id"),
            F.when(F.col("p").isNotNull(), canonical)
            .otherwise(F.col("bare"))
            .alias("id"),
        )
        malformed = with_bare.where(
            F.col("p").isNull() & F.col("bare").isNull()
        ).select("line")
    else:
        parsed = with_parse.where(F.col("p").isNotNull()).select(
            F.col("p.id_type").alias("id_type"),
            F.col("p.raw_id").alias("raw_id"),
            canonical.alias("id"),
        )
        malformed = with_parse.where(F.col("p").isNull()).select("line")
    return parsed, malformed
