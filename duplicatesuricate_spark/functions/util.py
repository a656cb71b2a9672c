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
