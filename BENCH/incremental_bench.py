#!/usr/bin/env python
"""Incremental-dedup cost evidence (round-2 verdict item 7).

Claim under test: merging a +10% batch of new documents into persisted
dedup state (streaming/incremental.py) costs a small fraction of a full
recompute over the union — the left-anti delta + band-semi-join design
only sketches and joins the fresh docs.

Protocol (same as BENCH/run_scaling.py: fresh JVM per phase via
subprocess so JVM warm-up and page-cache state don't leak across
measurements):

  1. split the prepared synthetic corpus 90/10 by doc_id hash;
  2. phase "build":       incremental_dedup(base)  on empty state  (wall A)
  3. phase "incremental": incremental_dedup(delta) on that state   (wall B)
  4. phase "full":        dedup_pipeline(base ∪ delta)             (wall C)
     (include_substring_pass=False — the incremental path has no
     substring channel, so C is the apples-to-apples full recompute)

Reported: walls A/B/C, B/C ratio, and assignment-count equality between
the incremental result (after step 3) and the full recompute.

Usage: python BENCH/incremental_bench.py [n_docs] [cores]
Appends one JSON line per phase to BENCH/data/incremental_runs.jsonl and
prints a summary JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

WORKER = """
import json, shutil, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from duplicatesuricate_spark import get_spark
from duplicatesuricate_spark.sources.corpus import with_doc_identity

phase = {phase!r}
spark = get_spark(app_name="inc-bench-" + phase, cores={cores},
                  shuffle_partitions={cores} * 2)
corpus = with_doc_identity(spark.read.parquet({corpus!r}))
is_delta = F.pmod(F.xxhash64("doc_id", F.lit(77)), F.lit(10)) == 9
base = corpus.where(~is_delta)
delta = corpus.where(is_delta)
n_base, n_delta = base.count(), delta.count()   # warm-up actions

t0 = time.monotonic()
if phase == "build":
    shutil.rmtree({state!r}, ignore_errors=True)
    from duplicatesuricate_spark.streaming.incremental import incremental_dedup
    out = incremental_dedup(spark, base, {state!r})
    n_out = out.count()
elif phase == "incremental":
    from duplicatesuricate_spark.streaming.incremental import incremental_dedup
    out = incremental_dedup(spark, delta, {state!r})
    n_out = out.count()
else:  # full recompute over the union, no substring channel
    from duplicatesuricate_spark.operators.dedup import dedup_pipeline
    res = dedup_pipeline(base.unionByName(delta), include_substring_pass=False)
    out = res.assignments
    n_out = out.count()
wall = time.monotonic() - t0
# clustering-sensitive signature (round-3 advice item 5: the raw
# assignment count is one-row-per-doc by construction in BOTH paths, so
# count equality can never detect clustering divergence).  The cluster-
# size histogram hash changes if ANY doc moves between clusters of
# different sizes; the non-singleton count catches gross divergence.
import hashlib
sizes = out.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("sz"))
hist = sorted(
    (r["sz"], r["n"]) for r in
    sizes.groupBy("sz").agg(F.count(F.lit(1)).alias("n")).collect()
)
n_nonsingleton = sum(n for sz, n in hist if sz >= 2)
cluster_sig = hashlib.sha256(json.dumps(hist).encode()).hexdigest()[:16]
print(json.dumps({{
    "phase": phase, "cores": {cores}, "n_base": n_base, "n_delta": n_delta,
    "n_assignments": n_out, "n_nonsingleton_clusters": n_nonsingleton,
    "cluster_histogram_sha": cluster_sig, "wall_sec": round(wall, 2),
}}))
spark.stop()
"""


def run_phase(phase: str, corpus: str, state: str, cores: int) -> dict:
    code = WORKER.format(repo=REPO, phase=phase, cores=cores,
                         corpus=corpus, state=state)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=5400,
        env=dict(os.environ, PYTHONPATH=REPO),
    )
    if out.returncode != 0:
        raise RuntimeError(f"{phase} failed:\n{out.stderr[-3000:]}")
    r = json.loads(out.stdout.strip().splitlines()[-1])
    with open(os.path.join(HERE, "data", "incremental_runs.jsonl"), "a") as f:
        f.write(json.dumps(r) + "\n")
    return r


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    from BENCH.run_scaling import prepare_corpus

    corpus = prepare_corpus(n_docs)
    state = os.path.join(HERE, "data", f"inc_state_{n_docs}")

    build = run_phase("build", corpus, state, cores)
    inc = run_phase("incremental", corpus, state, cores)
    full = run_phase("full", corpus, state, cores)

    ratio = inc["wall_sec"] / full["wall_sec"]
    summary = {
        "n_docs": n_docs,
        "cores": cores,
        "build_wall_sec": build["wall_sec"],
        "incremental_wall_sec": inc["wall_sec"],
        "full_recompute_wall_sec": full["wall_sec"],
        "delta_fraction": round(inc["n_delta"] / n_docs, 4),
        "incremental_vs_full": round(ratio, 3),
        "assignments_equal": inc["n_assignments"] == full["n_assignments"],
        # clustering-sensitive checks (size histogram + non-singleton
        # count) — the raw count above equals n_docs in both paths by
        # construction and can never catch clustering divergence
        "clusters_equal": (
            inc["cluster_histogram_sha"] == full["cluster_histogram_sha"]
        ),
        "n_nonsingleton_incremental": inc["n_nonsingleton_clusters"],
        "n_nonsingleton_full": full["n_nonsingleton_clusters"],
        "n_assignments_incremental": inc["n_assignments"],
        "n_assignments_full": full["n_assignments"],
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
