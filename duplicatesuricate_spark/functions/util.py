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

    Default MEMORY_AND_DISK (Spark's own Dataset.persist default): blocks
    are columnar-serialized either way and recompute from lineage on
    executor loss; keeping them in storage memory means reads hit
    already-committed heap pages instead of faulting fresh tmpfs pages,
    and the unified memory manager evicts overflow to disk — so the
    failure mode IS the old DISK_ONLY behavior.  Round-5 2x2 A/B at 2M
    docs / 8 cores (BENCH/BASELINE.md): with the pre-touched heap this is
    the fastest cell (308 s vs 336 s DISK_ONLY); WITHOUT AlwaysPreTouch it
    is the slowest (480 s — the same faults move into mid-query heap
    growth), which is why the session default pins both together.
    ``SPARK_GRAFT_PERSIST_LEVEL`` overrides (any ``pyspark.StorageLevel``
    attribute name).
    """
    from pyspark import StorageLevel

    name = persist_level_name()
    level = getattr(StorageLevel, name, None)
    if not isinstance(level, StorageLevel):
        valid = sorted(
            k for k, v in vars(StorageLevel).items()
            if isinstance(v, StorageLevel)
        )
        raise ValueError(
            f"SPARK_GRAFT_PERSIST_LEVEL={name!r} is not a StorageLevel; "
            f"valid names: {', '.join(valid)}"
        )
    return level


def persist_level_name() -> str:
    """The effective ``persist_level()`` as its StorageLevel attribute name
    (benchmark rows log this so configs stay separable across rounds)."""
    import os

    return os.environ.get("SPARK_GRAFT_PERSIST_LEVEL", "MEMORY_AND_DISK")
