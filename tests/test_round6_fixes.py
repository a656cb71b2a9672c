"""Round-6 regression tests: the optimization round's correctness fixes
and the equivalences its plan restructurings rely on.

1. ``split_bucket`` is overflow-free on full-range (xxhash64-minted)
   signed-64-bit ids — the old form threw ARITHMETIC_OVERFLOW under
   Spark 4's default ANSI mode for |id| >~ 3.5e9 — and still equals the
   documented Knuth formula exactly (verified against exact big-int
   Python arithmetic, the same values DuckDB computes with HUGEINT).
2. ``persist_level`` rejects a typo'd SPARK_GRAFT_PERSIST_LEVEL with a
   clear ValueError instead of an AttributeError deep inside an operator.
3. ``DedupResult.unpersist`` with ``persist=False`` does not re-execute
   the pipeline DAG to materialize metrics (there are no cached blocks to
   protect).
4. ``portable_simhash_pairs`` without a cache_registry no longer leaks a
   persisted table for the session lifetime (round-5 advice): the
   session's CacheManager stays empty.
5. The ngram/substring singleton-key join-side drop and the gram-key
   switch to xxhash64 preserve outputs (checked against a brute-force
   pure-Python Jaccard on a synthetic corpus with boilerplate).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

KNUTH_MULT = 2654435761
MOD = 1 << 32


def _py_bucket(i: int, salt: int, n_buckets: int = 10_000) -> int:
    """Exact big-int reference of the documented formula."""
    return ((i + salt) * KNUTH_MULT) % MOD % n_buckets


FULL_RANGE_IDS = [
    0, 1, 7, -1, -7,
    (1 << 31) - 1, 1 << 31, (1 << 31) + 12345,
    -(1 << 31) - 99,
    1 << 62, -(1 << 62),
    (1 << 63) - 1, -(1 << 63),
    3_500_000_001, -3_500_000_001,
]


@pytest.mark.parametrize("salt", [0, 7, 3])
def test_split_bucket_full_range_ids(spark, salt):
    from duplicatesuricate_spark.operators.sampling import split_bucket

    df = spark.createDataFrame(
        [(i,) for i in FULL_RANGE_IDS], "doc_id long"
    )
    got = {
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id", split_bucket("doc_id", salt=salt).alias("b")
        ).collect()
    }
    for i in FULL_RANGE_IDS:
        assert got[i] == _py_bucket(i, salt), (i, salt)


def test_deterministic_split_on_xxhash_ids(spark):
    """The sampling operators run end-to-end on engine-minted ids (the
    old form crashed under ANSI before reaching any assertion)."""
    from duplicatesuricate_spark.operators.sampling import (
        deterministic_sample, deterministic_split,
    )

    df = spark.createDataFrame(
        [(f"r{i}", f"p{i}", f"c{i}") for i in range(50)],
        "repo string, path string, commit string",
    ).withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
    out = deterministic_split(df, {"train": 0.8, "val": 0.2}, salt=7)
    rows = out.select("doc_id", "split").collect()
    assert len(rows) == 50
    for r in rows:
        expect = "train" if _py_bucket(r["doc_id"], 7) < 8000 else "val"
        assert r["split"] == expect
    assert deterministic_sample(df, 0.1, salt=3).count() <= 50


def test_persist_level_rejects_typo(monkeypatch):
    from duplicatesuricate_spark.functions.util import persist_level

    monkeypatch.setenv("SPARK_GRAFT_PERSIST_LEVEL", "MEMORY_AND_DISK2")
    with pytest.raises(ValueError, match="MEMORY_AND_DISK2"):
        persist_level()


def test_unpersist_without_persist_skips_metrics_materialization(spark):
    from duplicatesuricate_spark.operators.dedup import dedup_pipeline

    corpus = spark.createDataFrame(
        [(i, f"doc text number {i} alpha beta gamma", f"sha{i}")
         for i in range(20)],
        "doc_id long, content string, content_sha256 string",
    )
    res = dedup_pipeline(corpus, persist=False)
    res.assignments.count()
    metrics_before = res.metrics
    res.unpersist()
    # not materialized: still the SAME lazy plan object, not a rebuilt
    # driver-side DataFrame (the persist=True path swaps it out)
    assert res.metrics is metrics_before


def test_simhash_pairs_without_registry_leaves_cachemanager_empty(spark):
    from duplicatesuricate_spark.operators.lsh import portable_simhash_pairs

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog %d" % (i % 3),)
         for i in range(30)],
        "doc_id long, text string",
    )
    cm = spark._jsparkSession.sharedState().cacheManager()
    before = cm.numCachedEntries()
    n = portable_simhash_pairs(docs, k=3, bits=60, n_blocks=4,
                               hamming_threshold=3).count()
    assert n > 0
    # delta-based: the session is shared with other tests, so assert only
    # that THIS call registered nothing in the CacheManager
    assert cm.numCachedEntries() == before, (
        "registry-less call must not persist into the CacheManager"
    )


def _brute_jaccard_pairs(rows, k, threshold, max_df):
    """Pure-Python oracle of ngram_jaccard_pairs' documented semantics."""
    import re

    gram_sets = {}
    for doc_id, text in rows:
        toks = [t for t in re.split(r"[^a-z0-9_]+", text.lower()) if t]
        if len(toks) >= k:
            grams = {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}
        else:
            grams = {" ".join(toks)}
        gram_sets[doc_id] = grams
    if max_df > 0:
        from collections import Counter

        df_count = Counter(g for gs in gram_sets.values() for g in gs)
        gram_sets = {
            d: {g for g in gs if df_count[g] <= max_df}
            for d, gs in gram_sets.items()
        }
    out = {}
    ids = sorted(gram_sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            shared = len(gram_sets[a] & gram_sets[b])
            union = len(gram_sets[a]) + len(gram_sets[b]) - shared
            if shared >= 1 and union > 0:
                jac = round(shared / union, 6)
                if jac >= threshold:
                    out[(a, b)] = (shared, jac)
    return out


def test_ngram_jaccard_xxhash_keys_match_brute_force(spark):
    """Gram keys switched from md5 strings to xxhash64 longs, singleton
    grams dropped from the join sides: output must still equal the
    brute-force set semantics, including with a hot boilerplate gram
    capped by max_df."""
    from duplicatesuricate_spark.operators.textqa import ngram_jaccard_pairs

    boiler = "common header tokens appear in every file "
    rows = [
        (1, boiler + "alpha beta gamma delta epsilon zeta"),
        (2, boiler + "alpha beta gamma delta epsilon eta"),
        (3, boiler + "completely different content words here now"),
        (4, "unrelated text with no overlap at all whatsoever kappa"),
        (5, boiler + "alpha beta gamma delta epsilon zeta"),  # dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): (r["shared"], r["jaccard"])
        for r in ngram_jaccard_pairs(
            df, k=3, threshold=0.2, max_df=4
        ).collect()
    }
    want = _brute_jaccard_pairs(rows, k=3, threshold=0.2, max_df=4)
    assert got == want
