"""Id canonicalization, priority pick, and id-string parsing.

Reference semantics:
- canonical id = ``f"{type}::{raw}"`` (``paper.py:19,141-143``),
- priority pick = first non-null id in the fixed order
  doi > dblp > arxiv > corpusid (``paper.py:24-27,93-98``; the OrderedDict
  insertion order of ``set_external_id`` re-encoded as ``coalesce``),
- ``partial_from_string`` parses ``"{type}::{id}"``, rejecting unknown
  types and empty ids (``paper.py:146-179``) — here malformed rows yield
  NULL (counted/filtered by the caller) instead of raising,
- ``normalize_external_id`` = lowercase, strip, remove the punctuation
  class (``paper.py:226-228``).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from citation_graph_spark.functions.normalize import PUNCT_RE

ID_TYPES = ("doi", "dblp", "arxiv", "corpusid")
ID_SEP = "::"
MISSING_TITLE = "{{MISSING_TITLE}}"


def create_id(id_type: Column | str, raw_id: Column | str) -> Column:
    return F.concat_ws(ID_SEP, F.col(id_type) if isinstance(id_type, str) else id_type,
                       F.col(raw_id) if isinstance(raw_id, str) else raw_id)


def priority_id(ids_map: Column) -> Column:
    """First non-null id from a map<string,string> keyed by id type, as the
    canonical ``type::id`` string; NULL if none present."""
    candidates = [
        F.when(
            F.element_at(ids_map, t).isNotNull(),
            F.concat(F.lit(t + ID_SEP), F.element_at(ids_map, t)),
        )
        for t in ID_TYPES
    ]
    return F.coalesce(*candidates)


def parse_id_string(value: Column) -> Column:
    """``"doi::10.1/x"`` → struct(id_type, raw_id); NULL when the separator
    is missing, the type is unknown, or the id is empty."""
    trimmed = F.trim(value)
    sep_pos = F.instr(trimmed, ID_SEP)
    id_type = F.substring(trimmed, F.lit(1), sep_pos - 1)
    raw_id = F.substring(trimmed, sep_pos + 2, F.length(trimmed))
    ok = (sep_pos > 0) & id_type.isin(*ID_TYPES) & (F.length(raw_id) > 0)
    return F.when(ok, F.struct(id_type.alias("id_type"), raw_id.alias("raw_id")))


def normalize_external_id(name: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(name)), PUNCT_RE, "")


# C13 — URL templating. The reference builds provider request URLs by
# formatting a per-id-type identifier into a URL template
# (restful_database.py:80-111; formats semantic_scholar.py:62-66). There
# is no RPC in this engine (the corpus is a bulk scan), but the same
# templating is useful as a column expression — e.g. emitting provenance /
# lineage URLs into an export, or constructing join keys against an
# external snapshot keyed by API URL.
ID_URL_FORMATS = {"doi": "{id}", "arxiv": "arXiv:{id}", "corpusid": "CorpusID:{id}"}


def url_path_id(id_type: Column, raw_id: Column) -> Column:
    """Per-id-type URL identifier (``get_paper_id_for_url``,
    ``restful_database.py:80-101``): the raw id wrapped in its provider
    prefix. Unsupported id types yield NULL — the engine's standard
    malformed-row channel (the reference raises ``KeyError``; a bulk scan
    must count, not crash)."""
    expr = None
    for t, fmt in ID_URL_FORMATS.items():
        pre, _, post = fmt.partition("{id}")
        formatted = F.concat(F.lit(pre), raw_id, F.lit(post))
        expr = F.when(id_type == t, formatted) if expr is None else expr.when(
            id_type == t, formatted
        )
    return expr


def api_url(template: str, id_type: Column, raw_id: Column) -> Column:
    """``template.format(id=...)`` as a column expression
    (``get_paper_url`` / ``get_citing_papers_url``,
    ``restful_database.py:103-111``). NULL propagates from unsupported id
    types."""
    pre, sep, post = template.partition("{id}")
    if not sep:
        raise ValueError("template must contain '{id}'")
    return F.concat(F.lit(pre), url_path_id(id_type, raw_id), F.lit(post))
