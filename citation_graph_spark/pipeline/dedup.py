"""Deduplication operators for a training-data pipeline.

Five families, each a ``documents``-shaped DataFrame operator:

- ``exact_dedup`` — fingerprint groupBy (hash dedup); the 100 TB default.
- ``ngram_jaccard_pairs`` — exact word-n-gram Jaccard over candidate pairs
  *blocked on shared shingles* (an equi-join on the shingle string — no
  custom hashing, so a DuckDB oracle can reproduce it bit-for-bit).
- ``minhash_lsh_pairs`` — MinHash signatures (xxhash64 permutation family)
  + LSH banding + bucket join + exact-Jaccard verification restricted to
  the candidate pairs: both candidate generation AND verification scale
  with |candidates|, never all-pairs.
- ``simhash64`` / ``simhash_pairs`` — 64-bit SimHash from token hashes;
  near-dup = small Hamming distance, blocked on 16-bit chunks
  (pigeonhole: hamming ≤ 3 ⇒ at least one of 4 chunks equal).
- ``embedding_cosine_pairs`` — near-dup by embedding cosine similarity
  (brute-force pairwise via built-in array ops; see similarity.py for the
  top-k/ANN variants).

Everything is built-in expressions — zero Python UDFs in this module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from citation_graph_spark.caching import release_on_gc
from citation_graph_spark.pipeline.text import fingerprint, tokenize


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per distinct normalized text — keeps min doc_id (map-side
    partial min; no window, no sort)."""
    with_fp = docs.select("doc_id", fingerprint(F.col(text_col)).alias("fp"))
    keep = with_fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    return docs.join(keep.select("doc_id"), "doc_id")


def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(fp, n_docs, min_doc_id) for duplicate groups (n_docs > 1)."""
    return (
        docs.select("doc_id", fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .where(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# word n-gram shingles + exact jaccard (oracle-checkable)
# ---------------------------------------------------------------------------


def shingles(docs: DataFrame, n: int = 5, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams per document.

    The token array is materialized in its OWN projection before the
    n-gram transform: an expression captured inside a higher-order-
    function lambda is re-evaluated per element, so inlining ``tokenize``
    (a regexp split) into the ``slice`` would tokenize each document once
    per n-gram — O(len²) per doc (measured 7× on the sf0.1 corpus:
    4.2 s → 0.6 s). A separate aliased projection is evaluated once per
    row; CollapseProject keeps it separate because the alias is
    referenced more than once."""
    from citation_graph_spark.layout import scan_parallelism_floor

    with_toks = scan_parallelism_floor(docs).select(
        "doc_id", tokenize(F.col(text_col)).alias("_toks")
    )
    toks = F.col("_toks")
    # guard: sequence(1, 0) DESCENDS in Spark — short docs need an empty list
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return (
        with_toks.select("doc_id", F.explode(F.array_distinct(grams)).alias("shingle"))
    )


def _jaccard_from_intersections(inter: DataFrame, sh: DataFrame) -> DataFrame:
    """(doc_a, doc_b, n_common) + shingle-set sizes → (doc_a, doc_b, jaccard)."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
            ).alias("jaccard"),
        )
    )


def exact_jaccard_for_candidates(candidates: DataFrame, sh: DataFrame) -> DataFrame:
    """Exact Jaccard for the given ``(doc_a, doc_b)`` pairs ONLY.

    Work is O(|candidates| × avg shingle-set size): each candidate pair is
    expanded by doc_a's shingles and equi-joined to doc_b's — never the
    all-shared-shingle-pairs self-join. Both shingle sides are semi-join
    pruned to docs that appear in some candidate, so at 100 TB the scan feed
    into this step scales with the candidate set, not the corpus.

    Pairs with an empty intersection drop out (their Jaccard is 0)."""
    docs_a = candidates.select(F.col("doc_a").alias("doc_id")).distinct()
    docs_b = candidates.select(F.col("doc_b").alias("doc_id")).distinct()
    sa = sh.join(docs_a, "doc_id", "left_semi").select(
        F.col("doc_id").alias("doc_a"), "shingle"
    )
    sb = sh.join(docs_b, "doc_id", "left_semi").select(
        F.col("doc_id").alias("doc_b"), "shingle"
    )
    inter = (
        candidates.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    return _jaccard_from_intersections(inter, sh)


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 5,
    threshold: float = 0.5,
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with Jaccard ≥ threshold over
    distinct word-n-gram sets. Candidates = pairs sharing ≥1 shingle (the
    blocking equi-join); Jaccard is then exact: |∩| / (|A|+|B|-|∩|).

    ``max_df`` caps the *document frequency* of blocking shingles: a
    stop-phrase shingle shared by 10⁶ docs makes the uncapped self-join
    quadratic in that DF. With ``max_df`` set, only shingles with DF ≤
    max_df generate candidate pairs, and the Jaccard is then computed
    exactly over the FULL shingle sets of those candidates (high-DF
    shingles still count toward |∩| and |∪|). Recall loss is confined to
    pairs whose every shared shingle is more common than ``max_df`` —
    vanishingly unlikely for true near-duplicates. ``max_df=None`` (default)
    is the exact, oracle-checkable all-blocking behavior.

    Lazy: the caller owns persistence of the result (an eager checkpoint
    here would block filter/limit pushdown and pin non-replicated blocks —
    see caching.py). The persisted shingle/candidate intermediates are
    released when the RETURNED DataFrame is garbage-collected — keep a
    reference to it while any derived frame (``result.where(...)``) is
    still in use, or the caches go cold under the derivation; an explicit
    ``result.release_intermediates()`` handle is attached (see
    ``caching.release_on_gc`` for the full pitfall)."""
    sh = shingles(docs, n, text_col).persist()
    sh.count()  # eager hash-once (see minhash_lsh_pairs, r06)
    if max_df is None:
        a = sh.alias("a")
        b = sh.alias("b")
        inter = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .agg(F.count("*").alias("n_common"))
        )
        scored = _jaccard_from_intersections(inter, sh)
        intermediates = (sh,)
    else:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") <= max_df)
            .select("shingle")
        )
        blocking = sh.join(rare, "shingle", "left_semi")
        a = blocking.alias("a")
        b = blocking.alias("b")
        candidates = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
            .persist()
        )
        candidates.count()  # eager: verify references it 3×
        scored = exact_jaccard_for_candidates(candidates, sh)
        intermediates = (candidates, sh)
    return release_on_gc(
        scored.where(F.col("jaccard") >= threshold), *intermediates
    )


def duplicate_clusters(
    docs: DataFrame,
    n: int = 5,
    threshold: float = 0.5,
    text_col: str = "text",
    max_df: int | None = None,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, cluster_id) — transitive near-duplicate clusters.

    Pairwise near-dup detection alone under-removes: A≈B and B≈C leave
    both A and C in the corpus even when the whole chain is one document
    family. This composes the pair generator with the engine's hash-min
    connected components over the pair graph: ``cluster_id`` = min doc_id
    of the connected near-dup family; docs in no pair are their own
    cluster. Downstream dedup keeps one representative per ``cluster_id``
    (canonical choice = the id itself, deterministic).

    ``pairs``: pass a precomputed (doc_a, doc_b[, ...]) pair frame (e.g.
    ``minhash_lsh_pairs`` output — the 100 TB path); default recomputes
    exact ``ngram_jaccard_pairs`` (oracle-checkable)."""
    from citation_graph_spark.operators.components import connected_components

    if pairs is None:
        pairs = ngram_jaccard_pairs(docs, n, threshold, text_col, max_df)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    labels = connected_components(edges).labels.withColumnRenamed("id", "doc_id")
    return docs.select("doc_id").join(labels, "doc_id", "left").select(
        "doc_id", F.coalesce("label", "doc_id").alias("cluster_id")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (the 100 TB near-dup path)
# ---------------------------------------------------------------------------


def _signatures_from_shingles(sh: DataFrame, num_hashes: int) -> DataFrame:
    """(doc_id, shingle)* → (doc_id, sig array<long>).

    Permutation family: ``xxhash64(shingle, seed=i)`` for i in [0,H) — one
    pass over the exploded shingles, H running mins aggregated at once
    (no per-hash shuffle; the groupBy is a single hash agg)."""
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 64, n: int = 5, text_col: str = "text"
) -> DataFrame:
    """(doc_id, sig array<long>) — MinHash over the shingle set."""
    return _signatures_from_shingles(shingles(docs, n, text_col), num_hashes)


def _banded(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(doc_id, band, bucket) — one LSH bucket assignment per band."""
    if num_hashes % bands != 0:
        raise ValueError("bands must divide num_hashes")
    rows = num_hashes // bands
    return sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(",", *[F.element_at("sig", b * rows + r + 1).cast("string") for r in range(rows)])
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )


def _cap_buckets(
    assignments: DataFrame, keys: list[str], max_bucket: int | None
) -> DataFrame:
    """Drop bucket-assignment rows whose bucket holds > ``max_bucket``
    members — the band/chunk analog of ``max_df`` (VERDICT r04 #3).

    A degenerate bucket (10⁶ boilerplate near-identical docs landing in
    one band bucket — the realistic 100 TB skew case: template pages)
    makes the candidate self-join quadratic IN THAT BUCKET. The cap bounds
    per-bucket join work at max_bucket², making total candidate volume
    linear in corpus size for any fixed cap. Recall loss is confined to
    pairs whose EVERY matching bucket is oversized — for MinHash that
    means every agreeing band is shared by > max_bucket docs, i.e. the
    pair is boilerplate, exactly what exact dedup / template removal
    should have consumed first. Dropped volume is observable via
    ``minhash_band_bucket_sizes`` / ``simhash_chunk_bucket_sizes`` and is
    disclosed in the bench cost report."""
    if max_bucket is None:
        return assignments
    ok = (
        assignments.groupBy(*keys)
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") <= max_bucket)
        .select(*keys)
    )
    return assignments.join(ok, keys, "left_semi")


def _lsh_candidates_from_signatures(
    sig: DataFrame, num_hashes: int, bands: int, max_bucket: int | None = None
) -> DataFrame:
    """Banding + bucket equi-join: (doc_a, doc_b) pairs agreeing on ≥1 band
    (of size ≤ ``max_bucket`` when capped — see ``_cap_buckets``)."""
    banded = _cap_buckets(
        _banded(sig, num_hashes, bands), ["band", "bucket"], max_bucket
    )
    x = banded.alias("x")
    y = banded.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_band_bucket_sizes(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """(band, bucket, n_docs) — LSH bucket-occupancy profile, the
    diagnostic for choosing ``max_bucket`` (and the bench's disclosure of
    how many buckets a given cap drops)."""
    sig = _signatures_from_shingles(shingles(docs, n, text_col), num_hashes)
    return _banded(sig, num_hashes, bands).groupBy("band", "bucket").agg(
        F.count("*").alias("n_docs")
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 5,
    text_col: str = "text",
    max_bucket: int | None = None,
) -> DataFrame:
    """Unverified LSH candidate pairs (doc_a, doc_b) — exposed so callers
    (and the bench's cost report) can measure |candidates| directly."""
    sh = shingles(docs, n, text_col)
    return _lsh_candidates_from_signatures(
        _signatures_from_shingles(sh, num_hashes), num_hashes, bands, max_bucket
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 5,
    threshold: float = 0.5,
    text_col: str = "text",
    signatures_out: str | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate pairs from LSH banding, verified with exact Jaccard.

    bands × rows = num_hashes; a pair is a candidate iff some band of the
    signature matches exactly (bucket equi-join on (band, band-hash)).
    Candidates are then verified with the true shingle Jaccard computed
    ONLY over candidate pairs (``exact_jaccard_for_candidates``) — verify
    work scales with |candidates|, never with the number of
    shared-shingle pairs in the corpus. LSH only affects candidate recall;
    every emitted pair's Jaccard is exact.

    ``signatures_out``: optional parquet path for the ``(doc_id, sig)``
    signature table. When set, signatures are written there and the
    banding stage consumes the *re-read* table — a durable signature
    store (at 100 TB you hash the corpus once and keep the signatures;
    incremental batches only hash new docs), and the materialized values
    are exactly what downstream banding joined on, so an external checker
    can reproduce banding/bucket-join/verify from the store alone.

    ``max_bucket``: cap on LSH-bucket occupancy — band buckets holding
    more than this many docs generate NO candidates (``_cap_buckets``:
    bounds the self-join at max_bucket² per bucket against template-page
    mega-buckets; recall loss confined to pairs whose every agreeing band
    is that common). ``None`` keeps the exact uncapped behavior.

    Lazy result; intermediates released on result GC — hold the returned
    frame while any derivation of it is in use, or call the attached
    ``result.release_intermediates()`` handle when done (derived-frame
    pitfall: see ``caching.release_on_gc``)."""
    # persist + EAGER materialization: the verify step references
    # candidates 3× (two id-prunes + the intersection join) and shingles
    # 3× — without a shared materialization each reference would recompute
    # signatures + the banding self-join from scratch (measured 4× wall at
    # sf0.01). Counting each persisted intermediate BEFORE the next stage
    # consumes it matters too (r06): a first action over the whole lazy
    # chain materializes the not-yet-populated caches from several AQE
    # branches CONCURRENTLY, computing the same subtree 2-3× (duplicate
    # 1-task stage pairs in the r06 stage timeline). Interleaved A/B at
    # sf0.1: first run 9.2-9.5 s lazy → 3.3-4.1 s eager, warm runs
    # 2.4-2.6 s vs 2.6-2.9 s — eager won every round. This is the
    # hash-once contract, enforced eagerly; the RESULT stays lazy.
    sh = shingles(docs, n, text_col).persist()
    sh.count()
    intermediates: tuple = (sh,)
    sig = _signatures_from_shingles(sh, num_hashes)
    if signatures_out is not None:
        # the sidecar write materializes signatures; banding re-reads them
        sig.write.mode("overwrite").parquet(signatures_out)
        sig = docs.sparkSession.read.parquet(signatures_out)
    else:
        sig = sig.persist()
        sig.count()
        intermediates = (sig, sh)
    candidates = _lsh_candidates_from_signatures(
        sig, num_hashes, bands, max_bucket
    ).persist()
    candidates.count()
    return release_on_gc(
        exact_jaccard_for_candidates(candidates, sh).where(
            F.col("jaccard") >= threshold
        ),
        candidates,
        *intermediates,
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(
    docs: DataFrame, text_col: str = "text", token_hashes_out: str | None = None
) -> DataFrame:
    """(doc_id, simhash long) — 64-bit SimHash: for each bit, the sign of
    the sum over tokens of ±1 by that bit of xxhash64(token). Built from
    bitwise column expressions over the exploded token table (one shuffle).

    ``token_hashes_out``: optional parquet path for the per-token-instance
    ``(doc_id, h)`` hash table. When set, it is written and the bit-sum
    aggregation consumes the *re-read* table, so everything downstream of
    the (engine-specific) xxhash64 is reproducible by an external checker
    from the store alone."""
    from citation_graph_spark.layout import scan_parallelism_floor

    toks = scan_parallelism_floor(docs).select(
        "doc_id", F.explode(tokenize(F.col(text_col))).alias("tok")
    )
    th = toks.select("doc_id", F.xxhash64("tok").alias("h"))
    if token_hashes_out is not None:
        th.write.mode("overwrite").parquet(token_hashes_out)
        th = docs.sparkSession.read.parquet(token_hashes_out)
    h = F.col("h")
    bit_sums = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = th.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sim = term if sim is None else sim.bitwiseXOR(term)
    return agg.select("doc_id", sim.alias("simhash"))


def simhash_chunk_bucket_sizes(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(chunk_no, chunk, n_docs) — SimHash chunk-bucket occupancy profile
    (the ``max_bucket`` diagnostic twin of ``minhash_band_bucket_sizes``)."""
    sim = simhash64(docs, text_col)
    return _simhash_chunks(sim).groupBy("chunk_no", "chunk").agg(
        F.count("*").alias("n_docs")
    )


def _simhash_chunks(sim: DataFrame) -> DataFrame:
    """(doc_id, simhash, chunk_no, chunk) — 4 × 16-bit pigeonhole blocks."""
    return sim.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", 16 * c).bitwiseAND(F.lit(0xFFFF)).alias(f"c{c}")
                    for c in range(4)
                ]
            )
        ).alias("chunk_no", "chunk"),
    )


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    max_bucket: int | None = None,
    token_hashes_out: str | None = None,
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with Hamming(simhash) ≤ max_hamming.

    Blocking: split the 64-bit hash into 4 16-bit chunks; by pigeonhole any
    pair within Hamming ≤ 3 shares at least one exact chunk → equi-join per
    chunk, then exact Hamming verify via bit_count(xor).

    ``max_bucket``: cap on chunk-bucket occupancy — chunk buckets holding
    more than this many docs generate NO candidates (see ``_cap_buckets``;
    identical boilerplate docs share ALL chunks, so one template family
    otherwise makes every one of its 4 buckets quadratic). ``None`` keeps
    the exact uncapped behavior.

    Lazy result; intermediates released on result GC — hold the returned
    frame while any derivation of it is in use, or call the attached
    ``result.release_intermediates()`` handle when done (derived-frame
    pitfall: see ``caching.release_on_gc``)."""
    # persist: the self-join below references the chunk table twice — the
    # 64-bit-sum aggregation must run once (hash-once contract).
    # token_hashes_out: passed through to simhash64's sidecar store so an
    # external checker can reproduce chunking/capping/verify from it.
    sim = simhash64(docs, text_col, token_hashes_out=token_hashes_out)
    chunks = _simhash_chunks(sim).persist()
    chunks.count()  # eager hash-once (see minhash_lsh_pairs, r06)
    capped = _cap_buckets(chunks, ["chunk_no", "chunk"], max_bucket)
    x = capped.alias("x")
    y = capped.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.chunk_no") == F.col("y.chunk_no"))
            & (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.simhash").alias("sim_a"),
            F.col("y.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return release_on_gc(
        cand.select("doc_a", "doc_b", hamming.alias("hamming")).where(
            F.col("hamming") <= max_hamming
        ),
        chunks,
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float|double> columns — built-in
    ``aggregate``/``zip_with`` arithmetic, fully codegen'd."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def embedding_cosine_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cosine) for pairs with cosine ≥ threshold.

    Brute-force O(n²) pairwise — correct baseline for modest n; the scale
    path buckets by LSH first (similarity.ann_lsh_topk) and verifies, same
    shape as minhash_lsh_pairs."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = cosine_sim(
        F.col("va").cast("array<double>"), F.col("vb").cast("array<double>")
    )
    return pairs.select("id_a", "id_b", F.round(cos, 6).alias("cosine")).where(
        F.col("cosine") >= threshold
    )
