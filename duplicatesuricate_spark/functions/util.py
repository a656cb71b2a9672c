"""Small plan-shaping utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ONLY when the input has fewer partitions than the
    cluster can use.

    Why: compute-heavy narrow stages (shingling, sketch UDFs) inherit the
    scan's partitioning.  A small parquet file — or an AQE-coalesced
    shuffle — can leave ONE partition, serializing work that costs far
    more per byte than a shuffle would.  At real scale (inputs with
    partitions >> cores) this is a no-op, so the extra shuffle is never
    paid where it would hurt.
    """
    spark = df.sparkSession
    if target is None:
        target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def persist_level():
    """Storage level for the pipeline's big intermediate tables (sketches,
    band buckets, chunk hashes, pair sets).

    Default DISK_ONLY: serialized columnar blocks on the executor's local
    dirs, recomputable from lineage on executor loss, zero pressure on the
    unified memory region.  ``SPARK_GRAFT_PERSIST_LEVEL`` overrides (any
    ``pyspark.StorageLevel`` attribute name, e.g. MEMORY_AND_DISK) — on
    hosts where local dirs are tmpfs and fresh page allocation is the
    bottleneck, keeping blocks in storage memory (already-committed heap
    pages) avoids that path entirely; the unified memory manager evicts
    overflow to disk, so the failure mode is the default's behavior.
    """
    import os

    from pyspark import StorageLevel

    name = os.environ.get("SPARK_GRAFT_PERSIST_LEVEL", "DISK_ONLY")
    return getattr(StorageLevel, name)
