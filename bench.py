#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "throughput_docs_per_sec": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from duplicatesuricate_spark import get_spark  # noqa: E402
from duplicatesuricate_spark.operators.dedup import dedup_pipeline  # noqa: E402
from duplicatesuricate_spark.operators.similarity import brute_force_topk  # noqa: E402
from duplicatesuricate_spark.operators.substring import exact_substring_pairs  # noqa: E402
from duplicatesuricate_spark.operators.textqa import (  # noqa: E402
    fingerprints,
    language_id,
    ngram_jaccard_pairs,
    quality_scores,
    token_counts,
)
from duplicatesuricate_spark.sources.corpus import documents_as_corpus  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    spark = get_spark(app_name="dss-bench", cores=cpus)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    n_docs = docs.count()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    timings: dict[str, float] = {}

    def run(name: str, fn) -> None:
        t0 = time.monotonic()
        fn()
        timings[name] = round(time.monotonic() - t0, 3)

    corpus = documents_as_corpus(spark, sf_dir)
    run("dedup_pipeline", lambda: dedup_pipeline(corpus).assignments.count())
    run(
        "text_suite",
        lambda: (
            token_counts(docs).count(),
            quality_scores(docs).count(),
            language_id(docs).count(),
            fingerprints(docs).count(),
        ),
    )
    run("ngram_jaccard", lambda: ngram_jaccard_pairs(docs, threshold=0.3).count())
    run(
        "ann_topk",
        lambda: brute_force_topk(
            emb, emb.where(F.col("vec_id") < 32), k=10
        ).count(),
    )
    run("exact_substring", lambda: exact_substring_pairs(corpus).count())

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "dedup_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_docs": n_docs,
        "throughput_docs_per_sec": round(n_docs / timings["dedup_pipeline"], 2),
        "cpus": cpus,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
