"""Cache-lifetime helpers for hash-once blocked operators.

Blocked dedup/similarity operators persist *intermediates* (shingle
tables, LSH buckets, signature tables) because the verify step references
them several times inside one plan — without a shared materialization each
reference would recompute the hashing subtree from scratch (measured ~4×
wall at sf0.01 for ``minhash_lsh_pairs``).

The *result*, however, stays fully LAZY and the caller owns its
persistence: an eager ``localCheckpoint`` here would (a) force a full
materialization at call time that callers cannot push filters/limits
into, and (b) pin the result to non-replicated executor blocks with
truncated lineage, which executor loss or dynamic allocation on a real
cluster makes unrecoverable.  Measured cost of the eager variant on the
sf0.1 bench: 2× wall on ``minhash_lsh`` (see BENCH.md, round 4 A/B).

``release_on_gc`` squares lazy results with unpersist hygiene: the
persisted intermediates are released when the returned result DataFrame
is garbage-collected (or at interpreter shutdown), so no cached blocks
outlive the caller's use of the result.  While the caller holds the
result, the intermediates stay cached — which is exactly what makes a
second action on the result cheap.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame


def release_on_gc(result: DataFrame, *intermediates: DataFrame) -> DataFrame:
    """Return ``result`` unchanged; unpersist ``intermediates`` when it dies.

    The finalizer holds only the intermediate DataFrames (never the
    result), runs at GC or interpreter shutdown, and swallows errors from
    an already-stopped SparkContext.  Callers that want the blocks gone
    *now* can simply ``del`` the result (CPython refcounting collects it
    immediately once their own references are dropped) or call the
    explicit handle ``result.release_intermediates()``.

    DERIVED-FRAME PITFALL (documented in every operator that uses this):
    the finalizer is tied to the *returned object*, not to its plan. A
    caller that derives a new frame and drops the original —

        pairs = minhash_lsh_pairs(docs)
        top = pairs.where(...)   # derived frame, new Python object
        del pairs                # finalizer fires NOW

    — unpersists the hash-once intermediates before ``top`` ever runs,
    silently reintroducing the measured ~4× recompute (the derived plan
    still references the now-cold cached subtrees).  Keep a reference to
    the returned frame for as long as ANY derivation of it is in use, or
    call ``.release_intermediates()`` yourself once done.  Immediate
    collection on ``del`` is a CPython refcounting behavior; on other
    interpreters release happens at an eventual GC (never early — only
    possibly late, which is safe).
    """

    def _release(dfs: tuple[DataFrame, ...] = intermediates) -> None:
        for df in dfs:
            try:
                df.unpersist()
            except Exception:  # session stopped / JVM gone — nothing to free
                pass

    finalizer = weakref.finalize(result, _release)
    # explicit handle: deterministic release on any interpreter, idempotent
    # with the GC path (weakref.finalize runs at most once)
    result.release_intermediates = finalizer
    return result
