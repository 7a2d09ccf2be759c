"""Entity resolution — the reference's fuzzy ``Paper.__eq__`` as a blocked
self-join dedup.

Reference predicate (``/root/reference/src/citation_graph/paper.py:117-139``):
two records match iff
  (a) any id of the same type has the same non-null value, OR
  (b) neither title is the ``{{MISSING_TITLE}}`` placeholder AND
      year equal AND author SET equal AND titles resemble
      (levenshtein(normalized) < ceil(0.05·min len), ``paper.py:213-224``).

At scale a pairwise O(n²) comparison is impossible; (a) and (b) each have a
natural *blocking key*, so both stages are equi-joins:

- stage a: explode the ids map → join on (id_type, value) — exact.
- stage b: block on (year, canonical author-set key) where the key is the
  sorted, concatenated author list (set equality ⇒ equal sorted multiset —
  matches the reference because dataclass ``set()`` dedups identical
  names); inside a block, apply the resemblance predicate. Blocks are
  small (same year + same authors), so the within-block join is cheap.

``resolve_entities`` then runs connected components over the match pairs
(transitively closing matches, reusing the superstep operator) and assigns
each record its component's min record id as ``entity_id``.

Input frame: ``(rid, ids map<string,string>, authors
array<struct<forename,lastname>>, year int, title string)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from citation_graph_spark.functions.ids import MISSING_TITLE
from citation_graph_spark.functions.normalize import normalize_title

_RESEMBLE_FACTOR = 0.05


def _author_set_key(authors) -> "F.Column":
    # set-of-names equality key: dedup + sort the "forename\x1flastname"
    # strings, join with a separator that can't appear in names.
    names = F.transform(authors, lambda a: F.concat_ws("\x1f", a["forename"], a["lastname"]))
    return F.array_join(F.array_sort(F.array_distinct(names)), "\x1e")


def match_pairs_exact(papers: DataFrame) -> DataFrame:
    """(rid_a, rid_b) pairs sharing any (id_type, value), rid_a < rid_b."""
    ids = papers.select(
        "rid", F.explode("ids").alias("id_type", "id_value")
    ).where(F.col("id_value").isNotNull())
    a = ids.alias("a")
    b = ids.alias("b")
    return (
        a.join(
            b,
            (F.col("a.id_type") == F.col("b.id_type"))
            & (F.col("a.id_value") == F.col("b.id_value"))
            & (F.col("a.rid") < F.col("b.rid")),
        )
        .select(F.col("a.rid").alias("rid_a"), F.col("b.rid").alias("rid_b"))
        .distinct()
    )


def match_pairs_fuzzy(papers: DataFrame) -> DataFrame:
    """(rid_a, rid_b) pairs equal under the year+authors+title-resemblance
    rule, rid_a < rid_b. Blocked on (year, author-set key)."""
    prepared = papers.select(
        "rid",
        "year",
        _author_set_key(F.col("authors")).alias("akey"),
        F.col("title"),
        normalize_title(F.col("title")).alias("ntitle"),
    ).where(F.col("title") != MISSING_TITLE)
    a = prepared.alias("a")
    b = prepared.alias("b")
    blocked = a.join(
        b,
        (F.col("a.year") == F.col("b.year"))
        & (F.col("a.akey") == F.col("b.akey"))
        & (F.col("a.rid") < F.col("b.rid")),
    )
    threshold = F.ceil(
        F.least(F.length("a.ntitle"), F.length("b.ntitle")) * F.lit(_RESEMBLE_FACTOR)
    )
    return (
        blocked.where(F.levenshtein(F.col("a.ntitle"), F.col("b.ntitle")) < threshold)
        .select(F.col("a.rid").alias("rid_a"), F.col("b.rid").alias("rid_b"))
        .distinct()
    )


def match_pairs(papers: DataFrame) -> DataFrame:
    return match_pairs_exact(papers).unionByName(match_pairs_fuzzy(papers)).distinct()


def resolve_entities(papers: DataFrame) -> DataFrame:
    """papers → (rid, entity_id): transitive closure of the match relation
    via the connected-components superstep operator; singleton records keep
    their own rid."""
    from citation_graph_spark.operators.components import connected_components

    pairs = match_pairs(papers).select(
        F.col("rid_a").alias("src"), F.col("rid_b").alias("dst")
    )
    labels = connected_components(pairs).labels  # (id, label) for matched rids
    return (
        papers.select("rid")
        .join(labels.withColumnRenamed("id", "rid"), "rid", "left")
        .select("rid", F.coalesce("label", "rid").alias("entity_id"))
    )


def dedup_papers(papers: DataFrame) -> DataFrame:
    """One row per resolved entity — keeps the record with min rid (the
    reference's first-wins, ``traverser.py:97-107``, under the
    deterministic rid order)."""
    entities = resolve_entities(papers)
    with_ent = papers.join(entities, "rid")
    keep = with_ent.groupBy("entity_id").agg(F.min("rid").alias("rid"))
    return papers.join(keep.select("rid"), "rid")
