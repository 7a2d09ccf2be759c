import glob
import os

import pyspark.sql.functions as F

from citation_graph_spark import datagen
from citation_graph_spark.sources.databases import (
    html_anchor_extractor,
    merged_edges,
    text_url_extractor,
)
from citation_graph_spark.sources.pages import read_pages, root_page, write_pages
from citation_graph_spark.streaming.ingest import (
    crawl_stats_stream,
    read_pages_stream,
    stream_edges,
)


def _write_pages(spark, tmp_path, n=200):
    path = str(tmp_path / "pages")
    write_pages(datagen.generate_pages(spark, n, seed=42), path)
    return path


def test_read_pages_parquet_fallback(spark, tmp_path):
    path = _write_pages(spark, tmp_path)
    pages = read_pages(spark, path)
    assert pages.count() == 200
    assert [f.name for f in pages.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    # S1 point lookup
    assert root_page(pages, datagen.page_url(3)).count() == 1


def test_merged_edges_multi_source(spark, tmp_path):
    path = _write_pages(spark, tmp_path, n=100)
    pages = read_pages(spark, path)
    single = html_anchor_extractor(pages)
    merged = merged_edges(
        pages, {"html_anchors": html_anchor_extractor, "text_urls": text_url_extractor}
    )
    # text has no urls in the synthetic corpus → merged == deduped anchors
    anchors = single.groupBy("src", "dst").agg(F.min("pos").alias("pos"))
    got = {(r["src"], r["dst"], r["pos"]) for r in merged.select("src", "dst", "pos").collect()}
    exp = {(r["src"], r["dst"], r["pos"]) for r in anchors.collect()}
    assert got == exp
    assert merged.select("source").distinct().collect()[0]["source"] == "html_anchors"


def test_cli_bfs_end_to_end(spark, tmp_path):
    # programmatic entry (reference entry point 2): kwargs bypass argv
    from citation_graph_spark.cli import main

    path = _write_pages(spark, tmp_path, n=150)
    excl = tmp_path / "excl.txt"
    excl.write_text("# comment\ndoi::irrelevant\n")
    out_csv = str(tmp_path / "out_csv")
    rc = main(
        root=datagen.page_url(0),
        pages=path,
        max_depth=2,
        max_citations_per_paper=5,
        exclude=[str(excl)],
        list_file=out_csv,
        algorithm="bfs",
        master="local[8]",
    )
    assert rc == 0
    part = glob.glob(os.path.join(out_csv, "part-*.csv"))[0]
    lines = open(part).read().splitlines()
    assert lines[0].startswith("Depth;Parent id;Id;Authors;Title")
    assert len(lines) > 2  # header + root + at least one expansion


def test_cli_exclude_prunes_vertex(spark, tmp_path):
    """An excluded vertex (bare-url exclude entry) must actually vanish
    from the BFS output — the exclude id space is urls here."""
    from citation_graph_spark.cli import main

    path = _write_pages(spark, tmp_path, n=150)
    out1 = str(tmp_path / "csv_noexcl")
    assert main(
        root=datagen.page_url(0), pages=path, max_depth=1,
        algorithm="bfs", list_file=out1, master="local[8]",
    ) == 0
    ids1 = [
        line.split(";")[2]
        for p in glob.glob(os.path.join(out1, "part-*.csv"))
        for line in open(p).read().splitlines()[1:]
    ]
    victims = [i for i in ids1 if i != datagen.page_url(0)]
    assert victims
    excl = tmp_path / "excl_urls.txt"
    excl.write_text(f"{victims[0]}\n")

    out2 = str(tmp_path / "csv_excl")
    assert main(
        root=datagen.page_url(0), pages=path, max_depth=1, exclude=[str(excl)],
        algorithm="bfs", list_file=out2, master="local[8]",
    ) == 0
    ids2 = {
        line.split(";")[2]
        for p in glob.glob(os.path.join(out2, "part-*.csv"))
        for line in open(p).read().splitlines()[1:]
    }
    assert victims[0] not in ids2
    assert set(ids1) - {victims[0]} == ids2


def test_cli_pagerank_parquet_out(spark, tmp_path):
    from citation_graph_spark.cli import main

    path = _write_pages(spark, tmp_path, n=120)
    out = str(tmp_path / "ranks")
    rc = main(pages=path, algorithm="pagerank", output=out, max_iter=30, master="local[8]")
    assert rc == 0
    ranks = spark.read.parquet(out)
    assert ranks.columns == ["id", "rank"]
    total = ranks.agg(F.sum("rank")).first()[0]
    assert abs(total - 1.0) < 1e-6


def test_stream_edges_exactly_once(spark, tmp_path):
    pages_dir = str(tmp_path / "pages_stream")
    out_dir = str(tmp_path / "edges_out")
    ck_dir = str(tmp_path / "stream_ck")
    # two "crawl waves" land as separate files
    datagen.generate_pages(spark, 100, seed=42).write.parquet(pages_dir)
    q = stream_edges(
        read_pages_stream(spark, pages_dir, max_files_per_trigger=2),
        out_dir,
        ck_dir,
        num_buckets=4,
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out_dir).select("src", "dst", "pos")
    exp_raw = datagen.expected_edges(100, seed=42)
    # per-batch dedup only — global dedup is a downstream batch op; but the
    # synthetic generator never repeats (src, dst) across pages, so counts match
    exp = {}
    for s, d, p in exp_raw:
        key = (s, d)
        exp[key] = min(exp.get(key, 1 << 30), p)
    assert {(r["src"], r["dst"], r["pos"]) for r in got.collect()} == {
        (s, d, p) for (s, d), p in exp.items()
    }


def test_crawl_stats_stream(spark, tmp_path):
    pages_dir = str(tmp_path / "pages_stats")
    datagen.generate_pages(spark, 80, seed=42).write.parquet(pages_dir)
    stats = crawl_stats_stream(read_pages_stream(spark, pages_dir), window="1 hour")
    q = (
        stats.writeStream.outputMode("complete")
        .format("memory")
        .queryName("crawl_stats")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM crawl_stats").collect()
    assert sum(r["n_pages"] for r in rows) == 80
    assert {r["lang"] for r in rows} <= {"en", "de", "fi", "fr"}


def test_cli_new_algorithms(spark, tmp_path):
    """CLI drive of the round-5 algorithms: ppr (seeded at ROOT_URL),
    hits, kcore and linkpred all run end-to-end from the pages table and
    write parquet with the documented schemas."""
    import pyspark.sql.functions as F

    from citation_graph_spark.cli import main

    path = _write_pages(spark, tmp_path, n=120)

    out = str(tmp_path / "ppr")
    rc = main(
        root=datagen.page_url(0), pages=path, algorithm="ppr",
        output=out, max_iter=30, master="local[8]",
    )
    assert rc == 0
    ranks = spark.read.parquet(out)
    assert ranks.columns == ["id", "rank"]
    assert abs(ranks.agg(F.sum("rank")).first()[0] - 1.0) < 1e-6

    out = str(tmp_path / "hits")
    rc = main(pages=path, algorithm="hits", output=out, max_iter=20, master="local[8]")
    assert rc == 0
    scores = spark.read.parquet(out)
    assert scores.columns == ["id", "auth", "hub"]
    assert abs(scores.agg(F.sum("auth")).first()[0] - 1.0) < 1e-9

    out = str(tmp_path / "kcore")
    rc = main(pages=path, algorithm="kcore", k=2, output=out, master="local[8]")
    assert rc == 0
    core = spark.read.parquet(out)
    assert core.columns == ["id", "degree"]
    assert core.where("degree < 2").count() == 0

    out = str(tmp_path / "linkpred")
    rc = main(
        pages=path, algorithm="linkpred", min_common=1,
        max_center_degree=50, output=out, master="local[8]",
    )
    assert rc == 0
    lp = spark.read.parquet(out)
    assert lp.columns == ["a", "b", "common", "jaccard", "adamic_adar"]
    assert lp.where("a >= b").count() == 0


def test_cli_scc_and_hyperanf(spark, tmp_path):
    """CLI drive of scc and hyperanf end-to-end from the pages table."""
    from citation_graph_spark.cli import main

    path = _write_pages(spark, tmp_path, n=120)

    out = str(tmp_path / "scc")
    rc = main(pages=path, algorithm="scc", output=out, master="local[8]")
    assert rc == 0
    labels = spark.read.parquet(out)
    assert labels.columns == ["id", "scc"]
    # labels are a partition: every label is itself a member's id
    ids = {r["id"] for r in labels.collect()}
    assert {r["scc"] for r in labels.select("scc").distinct().collect()} <= ids

    out = str(tmp_path / "hanf")
    rc = main(pages=path, algorithm="hyperanf", output=out, max_iter=3, master="local[8]")
    assert rc == 0
    pv = spark.read.parquet(out)
    assert set(pv.columns) == {"id", "d", "rho_sum"}
    assert pv.select("d").distinct().count() == 4  # d = 0..3


def test_cli_centralities_and_metrics(spark, tmp_path):
    """CLI drive of harmonic, betweenness, and the scalar metrics row."""
    from citation_graph_spark.cli import main

    path = _write_pages(spark, tmp_path, n=120)

    out = str(tmp_path / "harm")
    rc = main(pages=path, algorithm="harmonic", output=out, max_iter=3, master="local[8]")
    assert rc == 0
    hc = spark.read.parquet(out)
    assert hc.columns == ["id", "harmonic"]
    assert hc.where("harmonic < 0").count() == 0

    out = str(tmp_path / "bc")
    rc = main(
        pages=path, algorithm="betweenness", k=8, max_iter=3,
        output=out, master="local[8]",
    )
    assert rc == 0
    bc = spark.read.parquet(out)
    assert bc.columns == ["id", "betweenness"]
    assert bc.where("betweenness < 0").count() == 0

    out = str(tmp_path / "met")
    rc = main(pages=path, algorithm="metrics", output=out, master="local[8]")
    assert rc == 0
    m = spark.read.parquet(out).first()
    assert 0.0 <= m["reciprocity"] <= 1.0
    assert m["total_edges"] >= m["mutual_edges"]


def test_cli_sssp(spark, tmp_path):
    from citation_graph_spark.cli import main

    path = _write_pages(spark, tmp_path, n=120)
    out = str(tmp_path / "sssp")
    rc = main(pages=path, algorithm="sssp", k=4, max_iter=10, output=out, master="local[8]")
    assert rc == 0
    d = spark.read.parquet(out)
    assert set(d.columns) == {"root", "id", "dist"}
    assert d.where("root = id AND dist <> 0").count() == 0


def test_cli_walks(spark, tmp_path):
    from citation_graph_spark.cli import main

    path = _write_pages(spark, tmp_path, n=120)
    out = str(tmp_path / "walks")
    rc = main(pages=path, algorithm="walks", max_iter=5, output=out, master="local[8]")
    assert rc == 0
    c = spark.read.parquet(out)
    assert set(c.columns) == {"walk", "step", "id"}
    assert c.where("step = 0 AND walk <> id").count() == 0
