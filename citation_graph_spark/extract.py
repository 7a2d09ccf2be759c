"""LinkExtract — vectorized reference extraction over Common-Crawl-style pages.

The reference fetches a paper's out-edges through a paginated REST API and
parses provider JSON into records (``src/citation_graph/restful_database.py:
142-192``, ``src/citation_graph/semantic_scholar.py:78-110``). Here the whole
corpus is already on disk, so extraction is a *bulk scan*: one vectorized
pandas UDF over the ``html``/``text`` columns emits ``array<string>`` of link
targets per page, exploded into the ``(src, dst, pos)`` edge DataFrame.

Byte-identity contract (BASELINE.json ``input_hint``): for every url, the
distributed extractor's output — both the extracted text and the ordered link
list — equals the single-process oracle exactly. Both sides share the same
compiled regexes and the same decode policy (utf-8, errors='replace'), so the
invariant holds by construction and is asserted in tests/test_extract.py.

No per-row Python on the Spark path: ``pandas.Series.str`` operations are
vectorized over Arrow record batches.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

# One spec, two consumers (UDF + oracle). Anchor-href extraction in document
# order; text = body text with tags stripped and whitespace collapsed.
# Tolerant of real-web markup: case-insensitive tag/attr names, double- or
# single-quoted or unquoted attribute values, whitespace around '='.
HREF_RE = re.compile(
    r"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>'"][^\s>]*))""",
    re.IGNORECASE,
)
TAG_RE = re.compile(r"<[^>]*>")
WS_RE = re.compile(r"\s+")
_DECODE = ("utf-8", "replace")


def _hrefs(decoded: str) -> list[str]:
    """Ordered href values (duplicates preserved) — the ONE extraction
    function both the Arrow UDF and the single-process oracle call, so
    byte-identity per url holds by construction."""
    out = []
    for m in HREF_RE.finditer(decoded):
        dq, sq, bare = m.groups()
        out.append(dq if dq is not None else sq if sq is not None else bare)
    return out


def extract_links_oracle(html: bytes | None) -> list[str]:
    """Single-process oracle: ordered hrefs (duplicates preserved)."""
    if html is None:
        return []
    return _hrefs(html.decode(*_DECODE))


def extract_text_oracle(html: bytes | None) -> str | None:
    """Single-process oracle: tag-stripped, whitespace-collapsed body text."""
    if html is None:
        return None
    stripped = TAG_RE.sub(" ", html.decode(*_DECODE))
    return WS_RE.sub(" ", stripped).strip()


def make_extract_links(max_html_bytes: int | None = None):
    """Factory for the href-extraction UDF with error tolerance.

    Per-page failure policy (the bulk-scan analog of the reference's
    consecutive-error breaker, ``traverser.py:175-181,206-221``): a page
    that cannot be extracted — an oversize document beyond
    ``max_html_bytes`` (the operational guard; Common-Crawl truncates at
    1 MiB) or an extraction exception — yields a NULL link array instead
    of failing the task. NULL explodes to zero edges, and the pipeline
    counts malformed pages via ``df.observe`` (see
    ``pages_to_raw_edges``): at 100 TB a handful of pathological pages
    must surface as a metric, never kill a 1000-executor stage.

    Missing html (NULL column) stays an EMPTY array — absent input is not
    an extraction error."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _extract(html: pd.Series) -> pd.Series:
        sizes = html.map(lambda b: len(b) if b is not None else 0)
        # mask oversize pages BEFORE decoding: the size guard must bound
        # per-page decode cost and executor memory, not just null the
        # output after a full decode of a pathological page (ADVICE r04)
        oversize = (
            sizes > max_html_bytes if max_html_bytes is not None else sizes < 0
        )
        decoded = html.where(~oversize).str.decode(*_DECODE)
        out = []
        for s, big in zip(decoded, oversize):
            if big:
                out.append(None)
            elif s is None:
                out.append([])
            else:
                try:
                    out.append(_hrefs(s))
                except Exception:
                    out.append(None)
        return pd.Series(out, index=html.index, dtype="object")

    return _extract


# default instance: no size guard — byte-identical to the oracle on every
# decodable page (the byte-identity contract above)
extract_links = make_extract_links()


@F.pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """Vectorized text extraction: strip tags, collapse whitespace."""
    decoded = html.str.decode(*_DECODE)
    stripped = decoded.str.replace(TAG_RE, " ", regex=True)
    return stripped.str.replace(WS_RE, " ", regex=True).str.strip()


def links_column(html: Column) -> Column:
    return extract_links(html)


def pages_to_raw_edges(
    pages: DataFrame,
    observation=None,
    max_html_bytes: int | None = None,
) -> DataFrame:
    """pages(url, html, ...) → raw edges (src, dst, pos).

    ``posexplode`` preserves extraction order as ``pos`` — the ordering key
    for the reference's per-src fan-out cap (``traverser.py:168-187``).
    Duplicate links within a page survive here (dedup is a separate,
    explicit operator in ``edges.build_edges``). Column pruning matters:
    only (url, html) are read; ``html`` never crosses a shuffle — the
    explode is map-side, and everything downstream carries strings only.

    ``observation``: pass a ``pyspark.sql.Observation`` to surface
    error-tolerance metrics with ZERO extra passes (``df.observe`` rides
    the scan): ``malformed_pages`` (extraction returned NULL — oversize
    per ``max_html_bytes`` or an extraction exception; such pages emit 0
    edges) and ``pages_scanned``. This is the bulk-scan twin of the
    reference's consecutive-error breaker: at 100 TB you read the
    malformed count off the finished job instead of aborting mid-crawl.
    """
    udf = (
        extract_links if max_html_bytes is None else make_extract_links(max_html_bytes)
    )
    linked = pages.select(
        F.col("url").alias("src"),
        udf(F.col("html")).alias("_links"),
        F.col("html").isNotNull().alias("_has_html"),
    )
    if observation is not None:
        linked = linked.observe(
            observation,
            F.count(
                F.when(F.col("_links").isNull() & F.col("_has_html"), 1)
            ).alias("malformed_pages"),
            F.count("*").alias("pages_scanned"),
        )
    return linked.select(
        "src", F.posexplode("_links").alias("pos", "dst")
    ).select("src", "dst", "pos")
