"""Extraction spec tests: the tolerant HREF pattern and the byte-identity
contract (Spark UDF output == single-process oracle, row for row)."""

import pyspark.sql.functions as F

from citation_graph_spark.extract import (
    extract_links,
    extract_links_oracle,
    extract_text,
    extract_text_oracle,
)

# (html, expected hrefs) — real-web messiness the crawler must tolerate
ADVERSARIAL = [
    (b'<a href="https://x/1">plain</a>', ["https://x/1"]),
    (b'<A HREF="https://x/2">uppercase tag+attr</A>', ["https://x/2"]),
    (b"<a class=nav href='https://x/3'>single quotes</a>", ["https://x/3"]),
    (b"<a href=https://x/4>unquoted</a>", ["https://x/4"]),
    (b'<a href = "https://x/5">spaces around =</a>', ["https://x/5"]),
    (b'<a\nrel="nofollow"\nhref="https://x/6">newlines</a>', ["https://x/6"]),
    (b'<a href="">empty</a>', [""]),
    (b"<a name=anchor>no href</a>", []),
    (
        b'<a href="https://x/a">1</a> text <A Href=\'https://x/b\'>2</A>'
        b"<a href=https://x/a>dup kept, order kept</a>",
        ["https://x/a", "https://x/b", "https://x/a"],
    ),
    (b"", []),
    (None, []),
    ("h\xe9llo <a href=\"https://x/u\">\xfc</a>".encode("latin-1"), ["https://x/u"]),
]


def test_oracle_handles_adversarial_markup():
    for html, exp in ADVERSARIAL:
        assert extract_links_oracle(html) == exp, html


def test_udf_matches_oracle_byte_identical(spark):
    rows = [(i, html) for i, (html, _) in enumerate(ADVERSARIAL)]
    df = spark.createDataFrame(rows, "i long, html binary")
    got = {
        r["i"]: (r["links"], r["text"])
        for r in df.select(
            "i",
            extract_links(F.col("html")).alias("links"),
            extract_text(F.col("html")).alias("text"),
        ).collect()
    }
    for i, (html, exp) in enumerate(ADVERSARIAL):
        assert got[i][0] == exp, html
        assert got[i][1] == extract_text_oracle(html), html


def test_malformed_pages_observed_metric(spark):
    """Error tolerance (reference analog: the consecutive-error breaker,
    traverser.py:175-181,206-221): an un-extractable page emits NULL links
    (0 edges) and is COUNTED via df.observe on the scan itself — no extra
    pass, no failed task. Missing html is absent input, not an error."""
    from pyspark.sql import Observation

    from citation_graph_spark.extract import pages_to_raw_edges

    rows = [
        ("good", b'<a href="https://x/1">ok</a>'),
        ("oversize", b"<a href=https://x/2>" + b"x" * 4096 + b"</a>"),
        ("nohtml", None),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    obs = Observation("extract")
    edges = pages_to_raw_edges(pages, observation=obs, max_html_bytes=1024)
    got = [(r["src"], r["dst"]) for r in edges.collect()]
    assert got == [("good", "https://x/1")]  # malformed page -> zero edges
    assert obs.get == {"malformed_pages": 1, "pages_scanned": 3}


def test_extract_links_default_has_no_size_guard(spark):
    """The default UDF keeps byte-identity with the oracle on every
    decodable page — the size guard is opt-in."""
    big = b"<a href=https://x/big>" + b"y" * 4096 + b"</a>"
    df = spark.createDataFrame([("u", big)], "url string, html binary")
    row = df.select(extract_links(F.col("html")).alias("links")).first()
    assert row["links"] == extract_links_oracle(big) == ["https://x/big"]
