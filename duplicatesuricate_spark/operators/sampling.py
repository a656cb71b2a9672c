"""Deterministic, engine-independent dataset splitting and sampling.

A training-data pipeline at 10^12-file scale needs train/val/test splits
and subsamples that are (a) reproducible run-to-run, (b) independent of
partitioning and parallelism, and (c) stable when the corpus grows — a
doc keeps its split forever, so held-out data never leaks into training
after an incremental append.  ``df.randomSplit``/``sample`` give none of
these (seeded per-partition RNG: repartitioning reshuffles the split).

The assignment here is a pure integer hash of the document id —
Knuth's multiplicative hash (TAOCP vol. 3 §6.4, multiplier 2654435761 =
floor(2^32/phi)) in exact int64 arithmetic, so any engine (DuckDB, a SQL
warehouse, a bash script) reproduces the identical split: no xxhash64 /
md5-to-int casts that differ or don't exist across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: floor(2^32 / golden ratio), the classic multiplicative-hash constant
KNUTH_MULT = 2654435761
_MOD = 1 << 32


def split_bucket(id_col: Column | str, salt: int = 0,
                 n_buckets: int = 10_000) -> Column:
    """Deterministic bucket in ``[0, n_buckets)`` for an integer id column:
    ``((id + salt) * KNUTH_MULT) mod 2^32 mod n_buckets`` in exact
    modular arithmetic for the FULL signed-64-bit id range.

    The multiply is done on the 16-bit halves of ``(id + salt) mod 2^32``
    and folded mod 2^32 after each product, so no intermediate exceeds
    2^49: the naive ``(id + salt) * KNUTH_MULT`` overflows int64 for
    |id| >~ 3.5e9 — which ANSI mode (Spark 4's default) turns into a
    runtime ARITHMETIC_OVERFLOW on exactly the ids this engine mints
    (``doc_id = xxhash64(...)``, full-range signed 64-bit).  For ids in
    the old documented domain (< 2^31) the result is bit-identical to the
    old expression, because mod-2^32 arithmetic is a ring homomorphism:
    ``((id + salt) * M) mod 2^32 == ((lo * M) mod 2^32
    + ((hi * M mod 2^32) << 16) mod 2^32) mod 2^32`` for
    ``lo/hi`` the 16-bit halves of ``(id + salt) mod 2^32``."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    m = F.lit(KNUTH_MULT)
    mod = F.lit(_MOD)
    # (id + salt) mod 2^32, overflow-free: reduce the id first (pmod keeps
    # it in [0, 2^32)), then add the reduced salt (< 2^33 total)
    s = F.pmod(
        F.pmod(col.cast("long"), mod) + F.lit(salt % _MOD), mod
    )
    lo = s.bitwiseAND(F.lit(0xFFFF))
    hi = F.shiftright(s, 16)
    mixed = F.pmod(
        F.pmod(lo * m, mod)
        + F.pmod(F.shiftleft(F.pmod(hi * m, mod), 16), mod),
        mod,
    )
    return F.pmod(mixed, F.lit(n_buckets))


def deterministic_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Assign every row a split label (``train``/``val``/``test``/...) with
    proportions ``weights``, deterministically from ``id_col`` alone.

    The bucket space is 10,000 so weights are honored to 4 decimal places;
    label boundaries are cumulative-weight prefixes, so ENLARGING a split's
    weight only moves docs across the one adjacent boundary (stable
    assignment under re-weighting).  Different ``salt`` values yield
    independent splits (e.g. per-epoch subsampling).

    Adds ``split`` (string); narrow map-side transform, no shuffle."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    bucket = split_bucket(id_col, salt=salt)
    expr = None
    acc = 0.0
    labels = list(weights.items())
    for name, wt in labels[:-1]:
        acc += wt / total
        bound = int(round(acc * 10_000))
        cond = bucket < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = labels[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def stratified_cap(
    df: DataFrame,
    group_col: str,
    cap: int,
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Keep at most ``cap`` rows per ``group_col`` value (per-domain /
    per-language quotas when mixing training data), chosen by the
    deterministic hash order ``(split_bucket(id), id)`` — so which docs
    survive is reproducible, independent of partitioning, and unbiased by
    storage order (hash order ~ random order, unlike "first N per group").

    One shuffle on ``group_col`` (the window); skewed giant groups are the
    exact rows the cap discards, and AQE splits the skewed partitions.
    Different ``salt`` draws an independent quota sample."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(split_bucket(id_col, salt=salt), F.col(id_col))
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by id hash (4-dp
    granularity) — the reproducible, partitioning-independent analogue of
    ``df.sample``; a kept id stays kept across runs and corpus growth."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    bound = int(round(fraction * 10_000))
    return df.filter(split_bucket(id_col, salt=salt) < F.lit(bound))
