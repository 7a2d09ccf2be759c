"""Deterministic synthetic data generators.

Two families:

1. ``generate_pages`` — the Common-Crawl-style input table per
   BASELINE.json ``input_hint``: ``(url string, warc_ts timestamp,
   html binary, text string, lang string)``. The link structure inside
   ``html`` is a *pure function* of ``(page_id, n_pages, seed)`` —
   ``page_link_targets`` — so the single-process extraction oracle can
   recompute exactly what the distributed extractor must emit
   (byte-identical per url). The in-degree distribution is Zipfian
   (low ids are hubs), which exercises skew handling.

2. ``*_edges`` fixtures — tiny closed-form graphs (cycle, star, two
   cliques + bridge) used by the algorithm unit tests, and
   ``zipf_edges`` — a JVM-side (no Python) scalable power-law edge
   generator used by the bench (pure Spark expressions over
   ``spark.range``; scales to arbitrarily many edges with no driver
   involvement).

Everything is seeded; no wall-clock, no external data.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession, functions as F

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_LANGS = ("en", "de", "fi", "fr")
# Adversarial text fragments: non-ASCII (cf. reference tests/test_paper.py:20,31),
# LaTeX math (cf. reference src/citation_graph/paper.py:13).
_TEXT_TEMPLATES = (
    "The quick brown fox jumps over page {i}.",
    "Matti Meikäläinen wrote about page {i} and $\\sqrt{{x}}$ holds.",
    "Seite {i} über Maßtheorie und $e^{{i\\pi}}+1=0$.",
    "Résumé of page {i}: naïve — café — 中文.",
)

_EPOCH = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)


def _mix64(x: int) -> int:
    """splitmix64 finalizer — cheap deterministic integer hash (public domain
    construction). Pure python so the oracle and generator share it."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def page_url(i: int) -> str:
    return f"https://crawl.example/page/{i}"


def page_out_degree(i: int, n_pages: int, seed: int, max_links: int = 20) -> int:
    """Out-degree of page ``i``. ~10% of pages are dangling (degree 0)."""
    h = _mix64(seed * 1_000_003 + i * 2 + 1)
    if h % 10 == 0:
        return 0
    return 1 + (h >> 8) % max_links


def page_link_targets(
    i: int, n_pages: int, seed: int, max_links: int = 20, skew: float = 2.0
) -> list[int]:
    """Ordered link targets of page ``i`` (may contain duplicates — the
    reference's within-page duplicate-citation case, dedup'd downstream).

    Target id = floor(n * u^skew) for uniform u — Zipf-ish mass on low ids,
    so id 0 is the hottest hub (skew-salting stress per SURVEY.md §7).
    Self-links are redirected to (i+1) mod n.
    """
    k = page_out_degree(i, n_pages, seed, max_links)
    targets = []
    for j in range(k):
        h = _mix64(seed * 7_000_003 + i * 1_000_003 + j)
        u = (h & 0xFFFFFFFF) / 2**32
        t = int(n_pages * (u**skew))
        t = min(t, n_pages - 1)
        if t == i:
            t = (t + 1) % n_pages
        targets.append(t)
    return targets


def page_text(i: int) -> str:
    return _TEXT_TEMPLATES[i % len(_TEXT_TEMPLATES)].format(i=i)


def page_html(i: int, n_pages: int, seed: int, max_links: int = 20) -> bytes:
    """Render the page. Every link appears as ``<a href="...">`` in target
    order; the body paragraph carries ``page_text``. Page ids ≡ 7 (mod 1000)
    get an empty html (adversarial row; extractor must emit no edges and
    empty text)."""
    if i % 1000 == 7:
        return b""
    anchors = "".join(
        f'<a href="{page_url(t)}">ref {j}</a>\n'
        for j, t in enumerate(page_link_targets(i, n_pages, seed, max_links))
    )
    doc = (
        f"<html><head><title>Page {i}</title></head><body>"
        f"<p>{page_text(i)}</p>\n{anchors}</body></html>"
    )
    return doc.encode("utf-8")


def generate_pages(
    spark: SparkSession,
    n_pages: int,
    seed: int = 42,
    max_links: int = 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed pages-table build: ``spark.range`` → ``mapInPandas``.

    The generator runs on executors partition-by-partition (each row derived
    purely from its id), so it scales with the cluster — no driver-side
    materialization.
    """
    import pandas as pd  # local import: runs inside executor workers too

    if num_partitions is None:
        num_partitions = max(1, min(64, n_pages // 2000 + 1))

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = {
                "url": [page_url(int(i)) for i in ids],
                "warc_ts": [
                    _EPOCH + datetime.timedelta(seconds=int(_mix64(seed + int(i)) % 86_400_000))
                    for i in ids
                ],
                "html": [page_html(int(i), n_pages, seed, max_links) for i in ids],
                "text": [page_text(int(i)) for i in ids],
                "lang": [_LANGS[int(i) % len(_LANGS)] for i in ids],
            }
            yield pd.DataFrame(rows)

    return spark.range(0, n_pages, numPartitions=num_partitions).mapInPandas(
        gen, schema=PAGES_SCHEMA
    )


def expected_edges(n_pages: int, seed: int = 42, max_links: int = 20) -> list[tuple[str, str, int]]:
    """Single-process oracle for the full extraction output: (src, dst, pos)
    rows, duplicates included, in extraction order."""
    out = []
    for i in range(n_pages):
        if i % 1000 == 7:
            continue
        for pos, t in enumerate(page_link_targets(i, n_pages, seed, max_links)):
            out.append((page_url(i), page_url(t), pos))
    return out


# ---------------------------------------------------------------------------
# Edge-table fixtures (SURVEY.md §5 / FIXTURES.md §2)
# ---------------------------------------------------------------------------

_EDGE_SCHEMA = "src long, dst long, pos int"


def _edges_df(spark: SparkSession, pairs: list[tuple[int, int]]) -> DataFrame:
    return spark.createDataFrame(
        [(int(s), int(d), int(p)) for p, (s, d) in enumerate(pairs)],
        "src long, dst long, pos int",
    ).select("src", "dst", "pos")


def cycle_edges(spark: SparkSession, n: int = 10) -> DataFrame:
    """Directed n-cycle: PageRank closed form = uniform 1/n."""
    return _edges_df(spark, [(i, (i + 1) % n) for i in range(n)])


def star_edges(spark: SparkSession, k: int = 50) -> DataFrame:
    """k spokes all pointing at hub 0 — max in-degree skew."""
    return _edges_df(spark, [(i, 0) for i in range(1, k + 1)])


def two_cliques_edges(spark: SparkSession, k: int = 5, bridge: bool = True) -> DataFrame:
    """Two directed k-cliques {0..k-1} and {k..2k-1}; optional bridge edge
    (k-1 → k). CC: one component with bridge, two without."""
    pairs = [(i, j) for i in range(k) for j in range(k) if i != j]
    pairs += [(i, j) for i in range(k, 2 * k) for j in range(k, 2 * k) if i != j]
    if bridge:
        pairs.append((k - 1, k))
    return _edges_df(spark, pairs)


def zipf_edges(
    spark: SparkSession,
    n_vertices: int,
    n_edges: int,
    seed: int = 42,
    skew: float = 2.0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Scalable power-law edge generator — pure Spark SQL expressions, zero
    Python. ``src`` uniform, ``dst`` = floor(n·u^skew) (hub-skewed). Used by
    the bench; the same construction at 10^12 edges is just a bigger range.
    """
    if num_partitions is None:
        num_partitions = max(8, min(256, n_edges // 500_000 + 8))
    df = spark.range(0, n_edges, numPartitions=num_partitions)
    h1 = F.abs(F.xxhash64(F.col("id"), F.lit(seed)))
    h2 = F.abs(F.xxhash64(F.col("id"), F.lit(seed + 1)))
    u = (h2 % 1_000_000_000) / 1_000_000_000.0
    return df.select(
        (h1 % n_vertices).alias("src"),
        F.least(
            F.floor(F.lit(float(n_vertices)) * F.pow(u, F.lit(skew))).cast("long"),
            F.lit(n_vertices - 1).cast("long"),
        ).alias("dst"),
        (F.col("id") % 2_147_483_647).cast("int").alias("pos"),
    ).where(F.col("src") != F.col("dst"))


_DOC_VOCAB = (
    "spark line column order small sort fast value scan hash slow group "
    "batch part vector query agg table key stream filter customer the a "
    "window join plan shuffle stage task cache block disk memory node "
    "cluster executor driver schema row array map struct union count sum "
    "min max avg rank dense lead lag over partition cluster bucket skew "
    "salt merge broadcast exchange codegen whole stage limit offset"
).split()


def generate_documents(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    near_dup_every: int = 20,
    exact_dup_every: int = 50,
    num_partitions: int | None = None,
) -> DataFrame:
    """Scalable deterministic ``documents``-shaped corpus — pure Spark SQL
    expressions, zero Python (the zipf_edges of text): each doc is 30-70
    vocabulary tokens derived from ``xxhash64(source_id, position)``, so
    the same construction at 10^9 docs is just a bigger range.

    Duplicate structure (what dedup operators need to find, mirroring the
    driver corpus's planted families):
    - ``id % exact_dup_every == 2`` → EXACT duplicate of ``id-1``
      (same source id, same length — byte-identical text);
    - ``id % near_dup_every == 1`` (and not the above) → NEAR duplicate
      of ``id-1``: same token stream except the first token is replaced,
      and one extra token appended (Jaccard high but < 1).
    Both derivations reuse ``id-1``'s token stream deterministically, so a
    single-process checker can reproduce any row from its id alone.
    """
    if num_partitions is None:
        num_partitions = max(4, min(256, n_docs // 50_000 + 4))
    v = len(_DOC_VOCAB)
    vocab = F.array(*[F.lit(w) for w in _DOC_VOCAB])
    df = spark.range(0, n_docs, numPartitions=num_partitions)
    doc_id = F.col("id")
    is_exact = (doc_id % exact_dup_every == 2) & (doc_id > 0)
    is_near = (doc_id % near_dup_every == 1) & ~is_exact & (doc_id > 0)
    src_id = F.when(is_exact | is_near, doc_id - 1).otherwise(doc_id)
    n_toks = (F.pmod(F.xxhash64(src_id, F.lit(seed)), F.lit(41)) + 30).cast("int")
    tok = lambda j: F.element_at(  # noqa: E731
        vocab, (F.pmod(F.xxhash64(src_id, F.lit(seed + 7), j), F.lit(v)) + 1).cast("int")
    )
    toks = F.transform(F.sequence(F.lit(1), n_toks), tok)
    # near-dup mutation: replace token 1, append one token — same stream
    # otherwise, so Jaccard over shingles stays high but below 1
    mut_head = F.concat(
        F.array(
            F.element_at(
                vocab,
                (F.pmod(F.xxhash64(doc_id, F.lit(seed + 13)), F.lit(v)) + 1).cast("int"),
            )
        ),
        F.slice(toks, 2, 100),
        F.array(
            F.element_at(
                vocab,
                (F.pmod(F.xxhash64(doc_id, F.lit(seed + 17)), F.lit(v)) + 1).cast("int"),
            )
        ),
    )
    text = F.array_join(F.when(is_near, mut_head).otherwise(toks), " ")
    return df.select(
        doc_id.alias("doc_id"),
        text.alias("text"),
        F.lit("en").alias("lang"),
        F.lit("synthetic").alias("source"),
        F.length(text).alias("n_chars"),
    )
