#!/usr/bin/env python
"""Per-stage wall profile of the dedup pipeline at a given size/cores.

Usage: python BENCH/probes/profile_stages.py <corpus_parquet> [cores] [limit]
Each stage is materialized with a count() and timed separately (stages
reuse upstream persisted tables exactly like dedup_pipeline does).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import functions as F  # noqa: E402

from duplicatesuricate_spark import get_spark  # noqa: E402
from duplicatesuricate_spark.config import DEFAULT_CONFIG as cfg  # noqa: E402
from duplicatesuricate_spark.functions.sketch import with_full_sketches  # noqa: E402
from duplicatesuricate_spark.functions.util import ensure_min_partitions  # noqa: E402
from duplicatesuricate_spark.operators.components import (  # noqa: E402
    assignments_with_singletons,
    connected_components,
)
from duplicatesuricate_spark.operators.dedup import exact_dup_edges  # noqa: E402
from duplicatesuricate_spark.operators.lsh import (  # noqa: E402
    band_explode,
    candidate_pairs,
    simhash_block_explode,
)
from duplicatesuricate_spark.operators.score import score_and_verify  # noqa: E402
from duplicatesuricate_spark.operators.substring import exact_substring_pairs  # noqa: E402
from duplicatesuricate_spark.sources.corpus import with_doc_identity  # noqa: E402

t0 = time.monotonic()
marks: list[tuple[str, float, int]] = []


def mark(name: str, n: int) -> None:
    marks.append((name, time.monotonic() - t0, n))
    print(f"{name:24s} +{marks[-1][1]:8.1f}s  n={n}", flush=True)


def main() -> None:
    corpus_path = sys.argv[1]
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    limit = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    spark = get_spark(app_name="profile", cores=cores, shuffle_partitions=cores * 2)
    corpus = with_doc_identity(spark.read.parquet(corpus_path))
    if limit:
        corpus = corpus.limit(limit).persist()
    mark("warmup_count", corpus.count())

    global t0
    t0 = time.monotonic()
    reps, exact_edges = exact_dup_edges(corpus)
    reps = ensure_min_partitions(reps)
    from pyspark import StorageLevel

    sketched = with_full_sketches(reps, cfg=cfg, with_chunks=True).select(
        "doc_id", "content_sha256", "shingles", "minhash", "simhash", "chunks"
    ).persist(StorageLevel.DISK_ONLY)
    mark("sketch_persist", sketched.count())

    bands = band_explode(sketched, cfg).unionByName(simhash_block_explode(sketched, cfg))
    cands = candidate_pairs(bands, cfg).persist()
    mark("candidate_pairs", cands.count())

    near = score_and_verify(cands, sketched, cfg).persist()
    mark("score_verify", near.count())

    sub = exact_substring_pairs(
        reps, cfg, chunk_table=sketched.select("doc_id", "chunks")
    ).persist()
    mark("substring_pass", sub.count())

    all_pairs = (
        near.select("id_a", "id_b")
        .unionByName(sub.select("id_a", "id_b"))
        .unionByName(exact_edges.select("id_a", "id_b"))
        .distinct()
        .persist()
    )
    mark("all_pairs", all_pairs.count())

    comps = connected_components(all_pairs)
    assignments = assignments_with_singletons(
        corpus.select("doc_id", "content_sha256"), comps
    )
    mark("cc_assignments", assignments.count())
    spark.stop()


if __name__ == "__main__":
    main()
