"""Extractor "databases" — the reference's multi-source plugin contract.

The reference queries an ordered list of citation databases and merges
their per-paper results, dropping fuzzy duplicates already collected
(``/root/reference/src/citation_graph/citation_graph.py:39``,
``traverser.py:147-161``; the ``Database`` subclass contract is
``database.py:240-268``). The Spark analog: an extractor is a function
``pages -> (src, dst, pos) DataFrame``; multiple extractors union by name
and dedup first-wins — SURVEY.md J5/U1.

Two concrete extractors ship:
- ``html_anchor_extractor`` — ``<a href>`` links from the ``html`` binary
  (the primary source; semantic_scholar.py analog),
- ``text_url_extractor`` — bare ``https?://…`` urls from the ``text``
  column (the second source; crossref.py analog — the reference ships it
  but disabled by default, so it is opt-in here too).

``merged_edges`` assigns each extractor a priority; identical (src, dst)
from different sources keep the highest-priority/lowest-pos row —
deterministic first-wins, matching ``traverser.py:97-107``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F

from citation_graph_spark.extract import extract_links

Extractor = Callable[[DataFrame], DataFrame]


def html_anchor_extractor(pages: DataFrame) -> DataFrame:
    return pages.select(
        F.col("url").alias("src"),
        F.posexplode(extract_links(F.col("html"))).alias("pos", "dst"),
    ).select("src", "dst", "pos")


_URL_RE = r"https?://[^\s\"'<>]+"


def text_url_extractor(pages: DataFrame) -> DataFrame:
    """Bare urls mentioned in the extracted text (regexp_extract_all —
    JVM-side, no UDF)."""
    urls = F.regexp_extract_all(F.col("text"), F.lit(_URL_RE), F.lit(0))
    return pages.select(
        F.col("url").alias("src"),
        F.posexplode(urls).alias("pos", "dst"),
    ).select("src", "dst", "pos")


DATABASES: dict[str, Extractor] = {
    "html_anchors": html_anchor_extractor,
    # "text_urls": text_url_extractor,  # second source, disabled by default
    # like the reference's crossref (citation_graph.py:39)
}


def merged_edges(pages: DataFrame, extractors: dict[str, Extractor] | None = None) -> DataFrame:
    """Union all extractors' edges, first-wins per (src, dst): lowest
    (priority, pos) survives, where priority = extractor order."""
    if extractors is None:
        extractors = DATABASES
    parts = []
    for prio, (name, fn) in enumerate(extractors.items()):
        parts.append(
            fn(pages).select(
                "src", "dst", "pos", F.lit(prio).alias("_prio"), F.lit(name).alias("source")
            )
        )
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    best = union.groupBy("src", "dst").agg(
        F.min(F.struct("_prio", "pos", "source")).alias("m")
    )
    return best.select(
        "src", "dst", F.col("m.pos").alias("pos"), F.col("m.source").alias("source")
    )
