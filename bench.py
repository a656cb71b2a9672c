#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

De-noised protocol (round-4 verdict item 4): every query is timed
SPARK_GRAFT_BENCH_RUNS times (default 2) in the same session; the
headline per-query number and the suite total use the MIN across runs
(single-sample spread on this shared host exceeded a whole round's
delta in r04), and the JSON carries all samples, the median, and the
1-min load average stamped at suite start and before every run so a
future reader can tell ambient noise from a code regression without
re-running.  Operator-internal caches are released between runs
(cache_registry / DedupResult.unpersist), so a repeat measures a real
re-execution instead of Spark's plan-matched cache.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec, min-per-query>, "unit": "sec",
   "queries": {name: min_sec, ...}, "queries_median": {...},
   "queries_runs": {name: [s1, s2, ...]}, "load1_at_start": ...,
   "load1_per_run": {name: [...]}, "sf": ..., ...}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from duplicatesuricate_spark import get_spark  # noqa: E402
from duplicatesuricate_spark.operators.dedup import dedup_pipeline  # noqa: E402
from duplicatesuricate_spark.operators.similarity import brute_force_topk  # noqa: E402
from duplicatesuricate_spark.operators.substring import exact_substring_pairs  # noqa: E402
from duplicatesuricate_spark.operators.lsh import portable_simhash_pairs  # noqa: E402
from duplicatesuricate_spark.operators.textqa import (  # noqa: E402
    fingerprints,
    language_id,
    ngram_jaccard_pairs,
    quality_scores,
    repetition_signals,
    token_counts,
)
from duplicatesuricate_spark.sources.corpus import documents_as_corpus  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    load1_start = round(os.getloadavg()[0], 2)

    spark = get_spark(app_name="dss-bench", cores=cpus)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    n_docs = docs.count()  # warm scan: charge first-touch I/O to setup, not queries
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    samples: dict[str, list[float]] = {}
    loads: dict[str, list[float]] = {}

    def run(name: str, fn) -> None:
        """Time ``fn`` n_runs times; ``fn`` returns a cleanup callable (or
        None) that releases any caches it owns — run OUTSIDE the timer so
        the repeat is a genuine re-execution at no measured cost."""
        samples[name] = []
        loads[name] = []
        for i in range(n_runs):
            loads[name].append(round(os.getloadavg()[0], 2))
            t0 = time.monotonic()
            cleanup = fn()
            samples[name].append(round(time.monotonic() - t0, 3))
            if cleanup is not None:
                cleanup()
            # progress to stderr (stdout stays ONE json line): a hung or
            # pathologically slow query is identifiable without waiting
            # for the suite to finish
            print(f"[bench] {name} run {i + 1}/{n_runs}: "
                  f"{samples[name][-1]}s (load1 {loads[name][-1]})",
                  file=sys.stderr, flush=True)

    corpus = documents_as_corpus(spark, sf_dir)

    def run_dedup():
        res = dedup_pipeline(corpus)
        res.assignments.count()
        return res.unpersist

    def run_text_suite():
        token_counts(docs).count()
        quality_scores(docs).count()
        language_id(docs).count()
        fingerprints(docs).count()
        return None

    def drain(owned: list):
        def _cleanup() -> None:
            while owned:
                owned.pop().unpersist()
        return _cleanup

    def run_ngram():
        owned: list = []
        ngram_jaccard_pairs(docs, threshold=0.3, cache_registry=owned).count()
        return drain(owned)

    def run_ann():
        brute_force_topk(emb, emb.where(F.col("vec_id") < 32), k=10).count()
        return None

    def run_substring():
        owned: list = []
        exact_substring_pairs(corpus, cache_registry=owned).count()
        return drain(owned)

    # round 5 additions — new keys, so r1-r4 totals stay comparable on the
    # original five (see BENCH/BASELINE.md "suite composition")
    def run_repetition():
        repetition_signals(docs).count()
        return None

    def run_simhash():
        owned: list = []
        portable_simhash_pairs(docs, cache_registry=owned).count()
        return drain(owned)

    run("dedup_pipeline", run_dedup)
    run("text_suite", run_text_suite)
    run("ngram_jaccard", run_ngram)
    run("ann_topk", run_ann)
    run("exact_substring", run_substring)
    run("repetition", run_repetition)
    run("simhash_pairs", run_simhash)

    timings = {k: min(v) for k, v in samples.items()}
    medians = {k: round(statistics.median(v), 3) for k, v in samples.items()}
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "dedup_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        "queries_runs": samples,
        "load1_at_start": load1_start,
        "load1_per_run": loads,
        "n_runs": n_runs,
        "sf": sf,
        "n_docs": n_docs,
        "throughput_docs_per_sec": round(n_docs / timings["dedup_pipeline"], 2),
        "cpus": cpus,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
