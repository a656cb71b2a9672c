"""LSH banding + candidate-pair generation (stages B5/B6).

This is the set-at-a-time replacement for the reference's blocking
prefilter: ``_Connector.all_any`` evaluates exact-key blocking row-by-row
per query (duplicatesuricate/connectors.py:135-213); the union of its
per-key equi-joins becomes ONE self-equi-join on LSH band keys.

Scale design (north rule: "explicit salting of hot bands, AQE skew-join,
bucketed repartitioning on band-hash keys"):

  * band keys are 64-bit hashes of 8-slot minhash slices — pure SQL
    (``xxhash64`` over ``slice``), no UDF, stays in codegen;
  * bucket sizes are counted with a window over the SAME hash partitioning
    the join uses, so AQE sees one exchange it can reuse;
  * buckets <= ``hot_band_cap`` produce all C(m,2) pairs via self-join
    (AQE skew-join splits any residual imbalance);
  * hot buckets (boilerplate headers, empty files) would produce O(m^2)
    pairs — instead they emit a SALTED TWO-LEVEL STAR: docs are salted into
    ``salt_buckets`` sub-groups, each sub-group emits (sub_min, doc) edges,
    then sub-mins emit (global_min, sub_min) edges.  Connectivity of the
    bucket is preserved with O(m) edges; the salt bounds the largest
    single-key group any task sees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from duplicatesuricate_spark.config import DedupConfig, DEFAULT_CONFIG


def band_explode(sketched: DataFrame, cfg: DedupConfig = DEFAULT_CONFIG) -> DataFrame:
    """(doc_id, minhash) -> (doc_id, band, band_hash), one row per band.

    Band hash = ``xxhash64(slice(minhash, band*rows+1, rows), band)``;
    mixing the band index into the hash keeps different bands with equal
    slices from colliding into one join key.
    """
    rows = cfg.rows_per_band
    band_hashes = F.transform(
        F.sequence(F.lit(0), F.lit(cfg.bands - 1)),
        lambda b: F.xxhash64(F.slice(F.col("minhash"), b * rows + 1, rows), b),
    )
    return sketched.select(
        "doc_id", F.posexplode(band_hashes).alias("band", "band_hash")
    )


def simhash_block_explode(
    sketched: DataFrame, cfg: DedupConfig = DEFAULT_CONFIG
) -> DataFrame:
    """(doc_id, simhash) -> (doc_id, band, band_hash) over SimHash blocks.

    The 64-bit signature is split into ``simhash_blocks`` equal blocks; by
    pigeonhole, any pair with Hamming distance <= simhash_blocks - 1 agrees
    exactly on at least one block (Manku, Jain & Das Sarma, "Detecting
    Near-Duplicates for Web Crawling", WWW'07).  Joining per block is
    therefore a COMPLETE candidate generator for the Hamming acceptance
    channel, unlike MinHash banding which is probabilistic.

    Band ids are offset by ``cfg.bands`` so they never collide with MinHash
    band keys when the two channels are unioned before one join.
    """
    n = cfg.simhash_blocks
    width = 64 // n
    mask = (1 << width) - 1
    blocks = F.array(*[
        F.xxhash64(
            F.shiftrightunsigned(F.col("simhash"), b * width).bitwiseAND(F.lit(mask)),
            F.lit(b + cfg.bands),
        )
        for b in range(n)
    ])
    return sketched.select(
        "doc_id", F.posexplode(blocks).alias("band", "band_hash")
    ).withColumn("band", F.col("band") + F.lit(cfg.bands))


def candidate_pairs(bands: DataFrame, cfg: DedupConfig = DEFAULT_CONFIG) -> DataFrame:
    """(doc_id, band, band_hash) -> distinct canonical pairs (id_a < id_b).

    Pair canonicalization mirrors the reference's ``unique_pairs``
    (duplicatesuricate/retrain.py:43-65: drop self-pairs, order-insensitive
    key, drop duplicates) as ``least/greatest + filter + distinct``.
    """
    # bucketed repartitioning on the band keys: ONE explicit exchange that
    # the window count AND the self-join both consume.  No partition count
    # is pinned — using the session's shuffle-partition number lets the
    # window's required HashPartitioning match exactly (a different count
    # would force a second exchange) and lets AQE size it.
    b = bands.repartition("band", "band_hash")
    w = Window.partitionBy("band", "band_hash")
    tagged = b.withColumn("bucket_n", F.count(F.lit(1)).over(w))

    # --- normal buckets: full pairwise self-join ---
    small = tagged.filter(
        (F.col("bucket_n") >= 2) & (F.col("bucket_n") <= cfg.hot_band_cap)
    ).select("band", "band_hash", "doc_id")
    left = small.alias("a")
    right = small.alias("b")
    pairs_small = left.join(right, ["band", "band_hash"]).where(
        F.col("a.doc_id") < F.col("b.doc_id")
    ).select(
        F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
    )

    # --- hot buckets: salted two-level star ---
    hot = tagged.filter(F.col("bucket_n") > cfg.hot_band_cap).select(
        "band", "band_hash", "doc_id",
        F.pmod(F.xxhash64("doc_id", F.lit(cfg.seed)), F.lit(cfg.salt_buckets))
        .alias("salt"),
    )
    sub_w = Window.partitionBy("band", "band_hash", "salt")
    sub = hot.withColumn("sub_min", F.min("doc_id").over(sub_w))
    star_leaf = sub.where(F.col("doc_id") != F.col("sub_min")).select(
        F.col("sub_min").alias("id_a"), F.col("doc_id").alias("id_b")
    )
    reps = sub.select("band", "band_hash", "sub_min").distinct()
    rep_w = Window.partitionBy("band", "band_hash")
    star_root = (
        reps.withColumn("g_min", F.min("sub_min").over(rep_w))
        .where(F.col("sub_min") != F.col("g_min"))
        .select(F.col("g_min").alias("id_a"), F.col("sub_min").alias("id_b"))
    )

    all_pairs = pairs_small.unionByName(star_leaf).unionByName(star_root)
    return (
        all_pairs.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .where(F.col("id_a") != F.col("id_b"))
        .distinct()
    )
