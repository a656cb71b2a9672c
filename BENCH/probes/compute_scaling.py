#!/usr/bin/env python
"""Strong-scaling of the pipeline's COMPUTE term in isolation.

Runs ONLY the sketch stage (JVM tokenize + xxhash64 + the fused Arrow
gram/MinHash/SimHash/chunk kernel) over the same corpus, one pass, no
persist, no downstream joins — the workload class the full pipeline's
wall should converge to on a real multi-executor cluster where every
node has its own kernel/page-fault path.

Usage: python BENCH/probes/compute_scaling.py <corpus_parquet> <cores>
Prints one JSON line; run per-cores in fresh processes, exclusively.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import functions as F  # noqa: E402

from duplicatesuricate_spark import get_spark  # noqa: E402
from duplicatesuricate_spark.functions.sketch import with_full_sketches  # noqa: E402
from duplicatesuricate_spark.functions.util import ensure_min_partitions  # noqa: E402
from duplicatesuricate_spark.sources.corpus import with_doc_identity  # noqa: E402


def main() -> None:
    corpus_path = sys.argv[1]
    cores = int(sys.argv[2])
    # same CPU pinning as scaling_worker.py (and same opt-out), so the
    # compute-only probe emulates an N-core executor honestly too
    if os.environ.get("SPARK_GRAFT_PIN_CPUS", "1") != "0":
        os.sched_setaffinity(0, set(range(cores)))
    spark = get_spark(app_name=f"compute-{cores}", cores=cores,
                      shuffle_partitions=cores * 2)
    corpus = with_doc_identity(spark.read.parquet(corpus_path))
    n = corpus.count()  # warm up: JVM, parquet footers, page cache

    sk = with_full_sketches(ensure_min_partitions(corpus), with_chunks=True)
    t0 = time.monotonic()
    # one aggregate over every sketch column so nothing is pruned and no
    # result of any size returns to the driver
    out = sk.agg(
        F.sum(F.size("shingles")), F.sum(F.size("minhash")),
        F.sum(F.size("chunks")), F.count("simhash"),
    ).collect()[0]
    wall = time.monotonic() - t0
    print(json.dumps({
        "cores": cores, "n_docs": n, "wall_sec": round(wall, 2),
        "docs_per_sec": round(n / wall, 2),
        "sums": [int(x) for x in out],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
