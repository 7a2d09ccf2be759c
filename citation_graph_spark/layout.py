"""Input-layout helpers.

``scan_parallelism_floor`` — a scale-adaptive floor on scan parallelism
for CPU-heavy per-row pipelines (shingling, token hashing, signature
UDFs). Guide §6: a small input (one file, one parquet row group) plans as
ONE scan split, so every downstream narrow transformation runs on a
single core until the first exchange; measured on the r06 bench corpus
this serialized the whole MinHash hash-once chain into 0.9-2.4 s
single-task stages while 31 cores idled.

The floor only engages when the PLANNED scan has fewer than half the
session's shuffle-partition count of splits — i.e. inputs at most
``(partitions/2) x maxPartitionBytes`` bytes, where one cheap round-robin
shuffle of the (by construction small) input unlocks full-cluster
parallelism for the expensive hashing that follows. At production scale
the input plans hundreds-plus splits and this is a structural no-op; the
threshold scales with the session's own parallelism setting, not with a
constant tuned to local mode.

Non-file-backed inputs (cached intermediates, in-memory frames) are left
untouched: their partitioning was chosen by whoever materialized them,
and computing split counts for a multi-source plan can itself trigger
stage materialization under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def scan_parallelism_floor(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` up to the session default
    parallelism iff it is file-backed and plans fewer than half that many
    scan splits. Row multiset is unchanged; row order is not part of any
    caller's contract (all consumers aggregate or window per key)."""
    spark = df.sparkSession
    try:
        if not df.inputFiles():
            return df
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    target = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    if n * 2 <= target:
        return df.repartition(target)
    return df
