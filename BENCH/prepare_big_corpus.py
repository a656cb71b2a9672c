#!/usr/bin/env python
"""Parallel synthetic-corpus builder for big scaling runs.

``synth_corpus`` is a driver-side pure-Python generator — fine at 20k-100k
rows, too slow at 1M+.  This script shards generation across executors:
each task runs the SAME generator on its own chunk (distinct seed, paths
prefixed by chunk id so (repo, path, commit) identity stays unique) and the
union preserves the corpus statistics (near-dup clusters, exact-substring
containments, boilerplate skew, singletons) within every chunk.

Usage: python BENCH/prepare_big_corpus.py [n_docs] [n_chunks]
Writes BENCH/data/corpus{n_docs}.parquet (the path run_scaling.py expects).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Iterator

import pandas as pd

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

OUT_SCHEMA = "repo string, path string, commit string, lang string, content string"


def make_generator(rows_per_chunk: int, base_seed: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from duplicatesuricate_spark.sources.synth import synth_corpus

        for pdf in batches:
            for chunk_id in pdf["id"]:
                corpus, _ = synth_corpus(
                    n_rows=rows_per_chunk, seed=base_seed + int(chunk_id)
                )
                corpus["path"] = f"c{int(chunk_id)}/" + corpus["path"]
                yield corpus[["repo", "path", "commit", "lang", "content"]]

    return gen


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    out = os.path.join(HERE, f"data/corpus{n_docs}.parquet")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        print(f"already exists: {out}")
        return

    from duplicatesuricate_spark import get_spark

    rows_per_chunk = n_docs // n_chunks
    spark = get_spark(app_name="corpus-prep", cores=32)
    chunks = spark.range(n_chunks).repartition(n_chunks)
    corpus = chunks.mapInPandas(make_generator(rows_per_chunk, 42), OUT_SCHEMA)
    corpus.write.mode("overwrite").parquet(out)
    # Sidecar build manifest + content fingerprint.  The corpus depends on
    # (n_docs, n_chunks, seed) — NOT just n_docs: rows_per_chunk changes
    # every chunk's generated structure, so two builds of "2M docs" with
    # different chunk counts have different near-dup statistics and
    # different true pair counts (round 5 lost an afternoon rediscovering
    # this after a gitignored corpus was regenerated with other defaults).
    # The fingerprint is order-insensitive (bit_xor of a row hash), so any
    # layout/repartitioning of the same content matches.
    import json

    from pyspark.sql import functions as F

    df = spark.read.parquet(out)
    n, fp = df.agg(
        F.count(F.lit(1)),
        F.bit_xor(F.xxhash64("repo", "path", "commit", "content")),
    ).first()
    manifest = {"n_docs": n, "n_chunks": n_chunks, "seed": 42,
                "rows_per_chunk": rows_per_chunk, "content_fingerprint": fp}
    with open(out + ".manifest.json", "w") as f:
        json.dump(manifest, f)
    print(f"wrote {n} docs to {out}  manifest: {json.dumps(manifest)}")
    spark.stop()


if __name__ == "__main__":
    main()
