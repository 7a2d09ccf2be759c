"""Expression-level ports of the reference's Paper unit tests
(/root/reference/tests/test_paper.py — golden pairs re-expressed against the
Spark column functions; no reference code copied)."""

import pytest
import pyspark.sql.functions as F

from citation_graph_spark.functions import (
    ID_TYPES,
    ascii_fold_py,
    authors_str,
    create_id,
    normalize_external_id,
    normalize_title,
    normalize_title_py,
    parse_id_string,
    priority_id,
    split_author_name,
    titles_resemble,
    titles_resemble_py,
)
from citation_graph_spark.functions.viz import hsv_to_hex, node_size


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


# ---------------- title normalization (test_paper.py:83-85) ----------------


def test_normalize_title_fold(spark):
    df = spark.createDataFrame([("á",), ("Meikäläinen",), ("This, is: A test",)], "t string")
    got = [r["n"] for r in df.select(normalize_title(F.col("t")).alias("n")).collect()]
    assert got[0] == "a"
    assert got[1] == "meikalainen"
    assert got[2] == "this is a test"
    # python oracle agrees (shared fold)
    assert got == [normalize_title_py(t) for t in ("á", "Meikäläinen", "This, is: A test")]


def test_ascii_fold_unicode():
    assert ascii_fold_py("Meikäläinen") == "Meikalainen"
    assert ascii_fold_py("Maßtheorie") == "Masstheorie"
    assert ascii_fold_py("naïve café") == "naive cafe"


# --------------- resemblance (test_paper.py:88-113) -------------------------

RESEMBLE = [
    ("This is a test", "This is a test"),
    ("this is A test", "This is a test"),
    ("This, is: A test", "This is a test"),
    ("This ís á tést", "This is a test"),
    (
        "This is $\\alpha$ tést with some more words to have a realistic length",
        "This is a test with some more words to have a realistic length",
    ),
]
NOT_RESEMBLE = [
    ("This is not a test", "This is a test"),
    ("This a test is", "This is a test"),
]


@pytest.mark.parametrize("t1, t2", RESEMBLE)
def test_titles_resemble(spark, t1, t2):
    df = spark.createDataFrame([(t1, t2)], "a string, b string")
    assert df.select(titles_resemble(F.col("a"), F.col("b")).alias("r")).first()["r"]
    assert titles_resemble_py(t1, t2)


@pytest.mark.parametrize("t1, t2", NOT_RESEMBLE)
def test_titles_do_not_resemble(spark, t1, t2):
    df = spark.createDataFrame([(t1, t2)], "a string, b string")
    assert not df.select(titles_resemble(F.col("a"), F.col("b")).alias("r")).first()["r"]
    assert not titles_resemble_py(t1, t2)


# --------------- ids (test_paper.py:62-80,180-197) --------------------------


def test_create_id(spark):
    df = spark.createDataFrame([("doi", "10.1/x")], "t string, i string")
    assert df.select(create_id("t", "i").alias("c")).first()["c"] == "doi::10.1/x"


@pytest.mark.parametrize("id_type", ID_TYPES)
def test_priority_single_id(spark, id_type):
    df = spark.createDataFrame([({id_type: "id_value"},)], "ids map<string,string>")
    got = df.select(priority_id(F.col("ids")).alias("p")).first()["p"]
    assert got == f"{id_type}::id_value"


def test_priority_order(spark):
    df = spark.createDataFrame(
        [({"corpusid": "c", "arxiv": "a", "doi": "d"},), ({"corpusid": "c", "dblp": "b"},), ({},)],
        "ids map<string,string>",
    )
    got = [r["p"] for r in df.select(priority_id(F.col("ids")).alias("p")).collect()]
    assert got == ["doi::d", "dblp::b", None]


@pytest.mark.parametrize("id_type", ID_TYPES)
def test_parse_id_string_valid(spark, id_type):
    df = spark.createDataFrame([(f"{id_type}::test-id",)], "s string")
    got = df.select(parse_id_string(F.col("s")).alias("p")).first()["p"]
    assert got["id_type"] == id_type and got["raw_id"] == "test-id"


@pytest.mark.parametrize(
    "bad", ["invalid-format", "invalid::format::test", "invalid::id_type", "empty-id::", "doi::"]
)
def test_parse_id_string_invalid(spark, bad):
    df = spark.createDataFrame([(bad,)], "s string")
    assert df.select(parse_id_string(F.col("s")).alias("p")).first()["p"] is None


def test_parse_id_string_nested_separator(spark):
    # split-once semantics: the id itself may contain '::'
    df = spark.createDataFrame([("doi::a::b",)], "s string")
    got = df.select(parse_id_string(F.col("s")).alias("p")).first()["p"]
    assert got["id_type"] == "doi" and got["raw_id"] == "a::b"


def test_normalize_external_id(spark):
    df = spark.createDataFrame([(" DOI ",), ("Corpus-Id",)], "s string")
    got = [r["n"] for r in df.select(normalize_external_id(F.col("s")).alias("n")).collect()]
    assert got == ["doi", "corpusid"]


# --------------- authors (test_paper.py:26-52) ------------------------------

AUTHOR_CASES = [
    ([("Jane", "Doe")], "Jane Doe", "Doe"),
    (
        [("Jane", "Doe"), ("Matti", "Meikäläinen")],
        "Jane Doe and Matti Meikäläinen",
        "Doe and Meikäläinen",
    ),
    (
        [("Jane", "Doe"), ("Matti", "Meikäläinen"), ("Pinco", "Pallino")],
        "Jane Doe, Matti Meikäläinen and Pinco Pallino",
        "Doe et al.",
    ),
    ([], "", ""),
]


@pytest.mark.parametrize("authors, long_s, short_s", AUTHOR_CASES)
def test_authors_str(spark, authors, long_s, short_s):
    df = spark.createDataFrame(
        [(authors,)], "authors array<struct<forename:string,lastname:string>>"
    )
    row = df.select(
        authors_str(F.col("authors")).alias("long"),
        authors_str(F.col("authors"), short=True).alias("short"),
    ).first()
    assert row["long"] == long_s
    assert row["short"] == short_s


def test_split_author_name(spark):
    df = spark.createDataFrame([("Ada M. Lovelace",), ("Plato",)], "name string")
    got = [r["s"] for r in df.select(split_author_name(F.col("name")).alias("s")).collect()]
    assert got[0]["forename"] == "Ada" and got[0]["lastname"] == "M. Lovelace"
    assert got[1]["forename"] == "Plato" and got[1]["lastname"] == "Plato"


# --------------- viz columns (utils.py:36-65) -------------------------------


def test_node_size(spark):
    import math

    df = spark.createDataFrame([(98,), (None,)], "c long")
    got = [r["s"] for r in df.select(node_size(F.col("c")).alias("s")).collect()]
    assert abs(got[0] - 10 * math.log10(100)) < 1e-9  # = 20
    assert abs(got[1] - 10 * math.log10(2)) < 1e-9


def test_hsv_to_hex(spark):
    import colorsys

    for h in (0.0, 0.25, 0.6, 0.8, 0.999):
        df = spark.createDataFrame([(h,)], "h double")
        got = df.select(
            hsv_to_hex(F.col("h"), F.lit(1.0), F.lit(1.0)).alias("c")
        ).first()["c"]
        r, g, b = colorsys.hsv_to_rgb(h, 1, 1)
        exp = "#{:02X}{:02X}{:02X}".format(int(r * 255), int(g * 255), int(b * 255))
        assert got == exp, h


def test_valid_filename_matches_reference_semantics(spark):
    """C10: runs of non-filename chars collapse to one '-' (utils.py:32-33);
    the column expression matches the python form, unicode included."""
    from citation_graph_spark.functions.export import valid_filename, valid_filename_col

    cases = [
        "A Paper: On Graphs? (v2)",
        "doi::10.1000/x#y",
        "weird\t\nname***",
        "ünïcode wörd",
        "already_safe-name (1).txt",
        "",
    ]
    assert valid_filename("A Paper: On Graphs? (v2)") == "A Paper- On Graphs- (v2)"
    assert valid_filename("doi::10.1000/x#y") == "doi-10.1000-x-y"
    assert valid_filename("weird\t\nname***") == "weird-name-"
    df = spark.createDataFrame([(c,) for c in cases], "name string")
    got = [
        r["f"] for r in df.select(valid_filename_col(F.col("name")).alias("f")).collect()
    ]
    assert got == [valid_filename(c) for c in cases]


def test_create_html_table_pads_rows():
    """C11: short rows padded with empty cells to the widest row
    (utils.py:84-97)."""
    from citation_graph_spark.functions.export import create_html_table

    html = create_html_table([["a", "b"], ["c"]])
    assert html == (
        "<table><tr><td>a</td><td>b</td></tr>"
        "<tr><td>c</td><td></td></tr></table>"
    )
    assert create_html_table([]) == "<table></table>"


def test_url_templating_c13(spark):
    """C13 twin: per-id-type URL identifier + template formatting
    (restful_database.py:80-111, semantic_scholar.py:62-66); unsupported
    id types -> NULL, never an error."""
    from citation_graph_spark.functions.ids import api_url, url_path_id

    rows = [
        ("doi", "10.1/x"),
        ("arxiv", "2101.00001"),
        ("corpusid", "123"),
        ("dblp", "conf/x/y"),  # no URL format -> NULL (reference: KeyError)
    ]
    df = spark.createDataFrame(rows, "id_type string, raw_id string")
    tpl = "https://api.semanticscholar.org/graph/v1/paper/{id}/citations"
    got = df.select(
        url_path_id(F.col("id_type"), F.col("raw_id")).alias("pid"),
        api_url(tpl, F.col("id_type"), F.col("raw_id")).alias("url"),
    ).collect()
    assert [r["pid"] for r in got] == [
        "10.1/x", "arXiv:2101.00001", "CorpusID:123", None,
    ]
    assert got[1]["url"] == (
        "https://api.semanticscholar.org/graph/v1/paper/arXiv:2101.00001/citations"
    )
    assert got[3]["url"] is None

    import pytest as _pytest

    with _pytest.raises(ValueError):
        api_url("https://no-placeholder", F.col("id_type"), F.col("raw_id"))
