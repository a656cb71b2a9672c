#!/usr/bin/env python
"""A/B probe: candidate_pairs with and without persisting the window-
tagged band table.  Usage: candprof.py <corpus_parquet> <cores> <a|b>
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from duplicatesuricate_spark import get_spark  # noqa: E402
from duplicatesuricate_spark.config import DEFAULT_CONFIG as cfg  # noqa: E402
from duplicatesuricate_spark.functions.sketch import with_full_sketches  # noqa: E402
from duplicatesuricate_spark.functions.util import ensure_min_partitions  # noqa: E402
from duplicatesuricate_spark.operators.lsh import (  # noqa: E402
    band_explode,
    candidate_pairs,
    simhash_block_explode,
)
from duplicatesuricate_spark.sources.corpus import with_doc_identity  # noqa: E402

corpus_path, cores, mode = sys.argv[1], int(sys.argv[2]), sys.argv[3]
spark = get_spark(app_name=f"candprof-{mode}", cores=cores,
                  shuffle_partitions=cores * 2)
corpus = with_doc_identity(spark.read.parquet(corpus_path))
corpus.count()

sk = with_full_sketches(ensure_min_partitions(corpus), cfg=cfg,
                        project=["doc_id", "content_sha256"])
sk = sk.persist(StorageLevel.DISK_ONLY)
t0 = time.monotonic()
n_sk = sk.count()
t_sk = time.monotonic() - t0
print(f"sketch_persist {t_sk:.1f}s n={n_sk}", flush=True)

bands = band_explode(sk, cfg).unionByName(simhash_block_explode(sk, cfg))

t0 = time.monotonic()
if mode == "a":
    cands = candidate_pairs(bands, cfg)
    n = cands.count()
else:
    # variant b: persist the tagged table so the window runs once
    b = bands.repartition("band", "band_hash")
    from pyspark.sql import Window

    w = Window.partitionBy("band", "band_hash")
    tagged = b.withColumn("bucket_n", F.count(F.lit(1)).over(w)).where(
        F.col("bucket_n") >= 2
    ).persist(StorageLevel.DISK_ONLY)
    n_tag = tagged.count()
    print(f"tagged rows (n>=2): {n_tag}", flush=True)
    # reuse candidate_pairs' pairing logic by monkey-feeding the tagged
    # table: replicate the tiering inline
    small = tagged.filter(F.col("bucket_n") <= cfg.hot_band_cap).select(
        "band", "band_hash", "doc_id"
    )
    pairs_small = (
        small.alias("a").join(small.alias("b"), ["band", "band_hash"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    hot_all = tagged.filter(F.col("bucket_n") > cfg.hot_band_cap).select(
        "band", "band_hash", "doc_id", "bucket_n",
        F.pmod(
            F.xxhash64("doc_id", "band", F.lit(cfg.seed)),
            F.ceil(F.col("bucket_n") / F.lit(cfg.hot_band_cap)).cast("long"),
        ).alias("salt"),
    )
    cliq = hot_all.filter(F.col("bucket_n") <= cfg.mega_band_cap).select(
        "band", "band_hash", "salt", "doc_id"
    )
    pairs_hot = (
        cliq.alias("a").join(cliq.alias("b"), ["band", "band_hash", "salt"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    from pyspark.sql import Window as W2

    sub_w = W2.partitionBy("band", "band_hash", "salt")
    sub = hot_all.withColumn("sub_min", F.min("doc_id").over(sub_w))
    star_leaf = sub.where(
        (F.col("bucket_n") > cfg.mega_band_cap)
        & (F.col("doc_id") != F.col("sub_min"))
    ).select(F.col("sub_min").alias("id_a"), F.col("doc_id").alias("id_b"))
    reps = sub.select("band", "band_hash", "sub_min").distinct()
    rep_w = W2.partitionBy("band", "band_hash")
    star_root = (
        reps.withColumn("g_min", F.min("sub_min").over(rep_w))
        .where(F.col("sub_min") != F.col("g_min"))
        .select(F.col("g_min").alias("id_a"), F.col("sub_min").alias("id_b"))
    )
    allp = (
        pairs_small.unionByName(pairs_hot)
        .unionByName(star_leaf).unionByName(star_root)
        .select(F.least("id_a", "id_b").alias("id_a"),
                F.greatest("id_a", "id_b").alias("id_b"))
        .where(F.col("id_a") != F.col("id_b")).distinct()
    )
    n = allp.count()
wall = time.monotonic() - t0
print(f"mode={mode} cores={cores} candidates={n} wall={wall:.1f}s", flush=True)
spark.stop()
