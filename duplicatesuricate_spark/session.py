"""SparkSession factory.

Single place to pin the execution config: Arrow on (all sketch kernels are
Arrow-batched pandas UDFs), AQE on (skew-join splitting + partition
coalescing), shuffle partitions sized to the sandbox (local[32]) rather
than the 200 default.  The reference had a bare ``SQLContext`` parameter
threaded through its dead Spark path (duplicatesuricate/connectors.py:236,
classifiers.py:77); here the session is an explicit, configured entry point.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "duplicatesuricate_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``cores=None`` -> ``local[*]``.  On a real cluster, ship the package with
    ``spark-submit --py-files duplicatesuricate_spark.zip`` and drop the
    ``master`` call — every other setting below is cluster-safe.
    """
    cores_env = os.environ.get("SPARK_GRAFT_CPUS")
    if cores is None and cores_env:
        cores = int(cores_env)
    master = f"local[{cores}]" if cores else "local[*]"
    n_shuffle = shuffle_partitions or (cores * 2 if cores else 32)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # shuffle sizing: ~2x cores locally; AQE coalesces the excess
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        # AQE: runtime re-planning, skew-join splitting, partition coalescing
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow transfer for every pandas UDF; bounded batches so a
        # 128-int minhash column times a wide batch can't blow executor mem
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
