"""Entity-resolution tests — the reference's equal/unequal Paper matrices
(/root/reference/tests/test_paper.py:116-177) as DataFrame rows."""

import pyspark.sql.functions as F

from citation_graph_spark.entity import dedup_papers, match_pairs, resolve_entities

SCHEMA = (
    "rid long, ids map<string,string>, "
    "authors array<struct<forename:string,lastname:string>>, "
    "year int, title string"
)

AB_CD = [("A", "B"), ("C", "D")]


def _papers(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _pairs(df):
    return {(r["rid_a"], r["rid_b"]) for r in df.collect()}


def test_equal_matrix(spark):
    papers = _papers(
        spark,
        [
            # same doi, same everything → match (id stage)
            (0, {"doi": "1234"}, AB_CD, 2022, "This is a test"),
            (1, {"doi": "1234"}, AB_CD, 2022, "This is a test"),
            # different doi but same year+authors+title → match (fuzzy stage)
            (2, {"doi": "5678"}, AB_CD, 2022, "This is a test"),
            # no ids at all, same content → match (fuzzy stage)
            (3, {}, AB_CD, 2022, "This is a test"),
        ],
    )
    got = _pairs(match_pairs(papers))
    assert got == {(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)}


def test_unequal_matrix(spark):
    papers = _papers(
        spark,
        [
            (0, {}, AB_CD, 2022, "This is a test"),
            (1, {}, [("A", "B"), ("C", "E")], 2022, "This is a test"),  # authors differ
            (2, {}, AB_CD, 2020, "This is a test"),  # year differs
            (3, {}, AB_CD, 2022, "This is not a test"),  # title too far
        ],
    )
    assert _pairs(match_pairs(papers)) == set()


def test_missing_title_never_fuzzy_matches(spark):
    papers = _papers(
        spark,
        [
            (0, {}, AB_CD, 2022, "{{MISSING_TITLE}}"),
            (1, {}, AB_CD, 2022, "{{MISSING_TITLE}}"),
            (2, {"doi": "x"}, AB_CD, 2022, "{{MISSING_TITLE}}"),
            (3, {"doi": "x"}, [], 0, "{{MISSING_TITLE}}"),
        ],
    )
    # only the shared-id pair matches
    assert _pairs(match_pairs(papers)) == {(2, 3)}


def test_author_set_semantics(spark):
    # set equality: duplicate author entries and order don't matter
    papers = _papers(
        spark,
        [
            (0, {}, [("A", "B"), ("C", "D"), ("A", "B")], 2022, "This is a test"),
            (1, {}, [("C", "D"), ("A", "B")], 2022, "This is a test"),
        ],
    )
    assert _pairs(match_pairs(papers)) == {(0, 1)}


def test_resolve_and_dedup_transitive(spark):
    # 0~1 via doi, 1~2 via fuzzy → {0,1,2} one entity; 3 alone
    papers = _papers(
        spark,
        [
            (0, {"doi": "d1"}, [], 1999, "Completely different title"),
            (1, {"doi": "d1", "arxiv": "a1"}, AB_CD, 2022, "This is a test"),
            (2, {}, AB_CD, 2022, "this is A test"),
            (3, {}, [("X", "Y")], 2001, "Another unrelated paper"),
        ],
    )
    ents = {r["rid"]: r["entity_id"] for r in resolve_entities(papers).collect()}
    assert ents[0] == ents[1] == ents[2] == 0
    assert ents[3] == 3
    kept = sorted(r["rid"] for r in dedup_papers(papers).select("rid").collect())
    assert kept == [0, 3]
