"""MinHash-128 + SimHash-64 sketching (stages B3/B4) — one Arrow pass.

The reference's similarity channel is per-row Python fuzzywuzzy
(duplicatesuricate/utils.py:99-113, 187-201, registered as row-at-a-time
Spark UDFs at utils.py:116,204).  The recast replaces it with sketches
computed in ONE Arrow-batched pandas UDF over the shingle arrays —
vectorized numpy inside, zero per-row Python (BASELINE.json input_hint).

MinHash family: multiply-shift universal hashing on uint64 —
``h_i(x) = (a_i * x + b_i) mod 2^64 >> 33`` with odd seeded ``a_i``.
Wrap-around multiplication is the hash (Dietzfelbinger et al. multiply-
shift); the top 31 bits are kept so each slot fits a signed int32.
All constants derive from ``cfg.seed`` — fully deterministic.

SimHash: per bit b of the 64-bit shingle hash, sum +/-1 over the doc's
shingles; bit b of the signature is 1 iff the sum is positive.  Stored as
one signed int64 (bit pattern of the uint64 signature).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from duplicatesuricate_spark.config import DedupConfig, DEFAULT_CONFIG

_SKETCH_SCHEMA = T.StructType([
    T.StructField("minhash", T.ArrayType(T.IntegerType(), False), False),
    T.StructField("simhash", T.LongType(), False),
])


def _perm_constants(cfg: DedupConfig) -> tuple[np.ndarray, np.ndarray]:
    """Seeded (a, b) multiply-shift constants; a forced odd."""
    rng = np.random.RandomState(cfg.seed & 0x7FFFFFFF)
    lo = rng.randint(0, 1 << 32, size=cfg.num_perms).astype(np.uint64)
    hi = rng.randint(0, 1 << 32, size=cfg.num_perms).astype(np.uint64)
    a = ((hi << np.uint64(32)) | lo) | np.uint64(1)
    lo = rng.randint(0, 1 << 32, size=cfg.num_perms).astype(np.uint64)
    hi = rng.randint(0, 1 << 32, size=cfg.num_perms).astype(np.uint64)
    b = (hi << np.uint64(32)) | lo
    return a, b


def _sketch_batch(
    shingle_lists: pd.Series, a: np.ndarray, b: np.ndarray, num_perms: int
) -> pd.DataFrame:
    """Vectorized over the whole Arrow batch: flatten every doc's shingles
    into one array, hash per-perm, segment-reduce mins with
    ``np.minimum.reduceat`` — no per-row Python loop over shingles."""
    lens = shingle_lists.map(len).to_numpy(dtype=np.int64)
    n_docs = len(lens)
    if n_docs == 0:
        return pd.DataFrame({"minhash": [], "simhash": []})
    # empty shingle sets get one sentinel shingle so reduceat stays aligned
    safe = np.maximum(lens, 1)
    starts = np.concatenate(([0], np.cumsum(safe)[:-1]))
    flat = np.empty(int(safe.sum()), dtype=np.uint64)
    for i, lst in enumerate(shingle_lists):
        s = starts[i]
        if len(lst):
            flat[s : s + len(lst)] = np.asarray(lst, dtype=np.int64).view(np.uint64)
        else:
            flat[s] = np.uint64(0)

    # --- MinHash: per-perm multiply-shift, segmented min ---
    mins = np.empty((num_perms, n_docs), dtype=np.int32)
    for p in range(num_perms):
        hv = (flat * a[p] + b[p]) >> np.uint64(33)
        mins[p] = np.minimum.reduceat(hv, starts).astype(np.int32)
    minhash = list(np.ascontiguousarray(mins.T))

    # --- SimHash: segmented sum of bit columns, sign -> bit ---
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((flat[:, None] >> shifts) & np.uint64(1)).astype(np.int32)
    ones = np.add.reduceat(bits, starts, axis=0)       # (n_docs, 64)
    sig_bits = (2 * ones > safe[:, None]).astype(np.uint64)
    simhash = (sig_bits << shifts).sum(axis=1, dtype=np.uint64).view(np.int64)

    return pd.DataFrame({"minhash": minhash, "simhash": simhash})


def make_sketch_udf(cfg: DedupConfig = DEFAULT_CONFIG):
    a, b = _perm_constants(cfg)
    num_perms = cfg.num_perms

    @pandas_udf(_SKETCH_SCHEMA)
    def sketch(shingles: pd.Series) -> pd.DataFrame:
        return _sketch_batch(shingles, a, b, num_perms)

    return sketch


def with_sketches(df: DataFrame, cfg: DedupConfig = DEFAULT_CONFIG) -> DataFrame:
    """shingles array<long> -> + minhash array<int>, simhash long."""
    sk = make_sketch_udf(cfg)(F.col("shingles"))
    return (
        df.withColumn("_sk", sk)
        .withColumn("minhash", F.col("_sk.minhash"))
        .withColumn("simhash", F.col("_sk.simhash"))
        .drop("_sk")
    )


# ---------------------------------------------------------------- oracles


def minhash_simhash_py(
    shingles: list[int], cfg: DedupConfig = DEFAULT_CONFIG
) -> tuple[list[int], int]:
    """Pure-Python (bigint) reimplementation used only by tests to pin the
    UDF's arithmetic: mod-2^64 multiply-shift, independent of numpy."""
    a, b = _perm_constants(cfg)
    xs = [x & 0xFFFFFFFFFFFFFFFF for x in shingles] or [0]
    mh = []
    for p in range(cfg.num_perms):
        ap, bp = int(a[p]), int(b[p])
        mh.append(min(((ap * x + bp) & 0xFFFFFFFFFFFFFFFF) >> 33 for x in xs))
    sig = 0
    for bit in range(64):
        ones = sum((x >> bit) & 1 for x in xs)
        if 2 * ones > len(xs):
            sig |= 1 << bit
    if sig >= 1 << 63:
        sig -= 1 << 64
    return mh, sig
