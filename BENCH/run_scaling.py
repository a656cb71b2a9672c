#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.md contract).

No real cluster exists in the sandbox, so N -> 4N executors is proxied by
local[8] -> local[32] (per the task directive): the same job, same input,
two parallelism levels, each in a FRESH JVM (subprocess), reporting
files/sec at both and efficiency = (throughput_4N / throughput_N) / 4.

Usage: python BENCH/run_scaling.py [n_docs] [low_cores] [high_cores]
Writes BENCH/SCALING_RUN.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def prepare_corpus(n_docs: int) -> str:
    path = os.path.join(HERE, f"data/corpus{n_docs}.parquet")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    from duplicatesuricate_spark import get_spark
    from duplicatesuricate_spark.sources.synth import synth_corpus

    pdf, _ = synth_corpus(n_rows=n_docs, seed=42)
    spark = get_spark(app_name="scaling-prep", cores=8)
    spark.createDataFrame(pdf).repartition(64).write.mode("overwrite").parquet(path)
    spark.stop()
    return path


def run_worker(cores: int, corpus: str, repeats: int = 2) -> dict:
    """Best of ``repeats`` fresh-JVM runs (GC/page-cache variance on the
    shared sandbox host is large; best-of is the standard throughput
    protocol and is applied identically to both parallelism levels).

    Every completed run is appended to BENCH/data/scaling_runs.jsonl as it
    finishes (a crashed later worker can't lose earlier measurements), and
    a failed worker is retried once before giving up."""
    env = dict(os.environ, PYTHONPATH=REPO)
    log_path = os.path.join(HERE, "data", "scaling_runs.jsonl")
    best = None
    done = 0
    failures = 0
    while done < repeats:
        out = subprocess.run(
            [sys.executable, os.path.join(HERE, "scaling_worker.py"),
             str(cores), corpus],
            capture_output=True, text=True, env=env, timeout=5400,
        )
        if out.returncode != 0:
            failures += 1
            sys.stderr.write(
                f"worker cores={cores} attempt failed "
                f"({failures}):\n{out.stderr[-2000:]}\n"
            )
            if failures > repeats:
                raise RuntimeError(f"worker cores={cores} kept failing")
            continue
        r = json.loads(out.stdout.strip().splitlines()[-1])
        with open(log_path, "a") as f:
            f.write(json.dumps(r) + "\n")
        done += 1
        if best is None or r["files_per_sec"] > best["files_per_sec"]:
            best = r
    return best


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    corpus = prepare_corpus(n_docs)

    r_low = run_worker(low, corpus)
    r_high = run_worker(high, corpus)
    eff = (r_high["files_per_sec"] / r_low["files_per_sec"]) / (high / low)
    result = {
        "n_docs": n_docs,
        "low": r_low,
        "high": r_high,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "passes": eff >= 0.8,
    }
    print(json.dumps(result))

    md = f"""# BENCH/SCALING_RUN.md — raw harness output (see BASELINE.md for analysis)

Sandbox proxy for the north rule's "N -> 4N executors" (no real cluster
available): the SAME full dedup pipeline (exact pre-pass -> shingle ->
MinHash/SimHash -> LSH band join + SimHash blocks + substring pass ->
exact-Jaccard verify -> connected components) over the SAME deterministic
{n_docs}-doc synthetic source-code corpus, at local[{low}] and
local[{high}], each in a fresh JVM; wall time measured after a warm-up
action so JVM startup is excluded from throughput.

| parallelism | wall (s) | files/sec |
|---|---|---|
| local[{low}]  | {r_low['wall_sec']} | {r_low['files_per_sec']} |
| local[{high}] | {r_high['wall_sec']} | {r_high['files_per_sec']} |

**Scaling efficiency** = (files/sec @{high} / files/sec @{low}) / {high // low}
= **{eff:.3f}** (target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"})

Output invariance: both runs produced {r_low['n_assignments']} assignments
and {r_low['n_pairs']} pairs ({'identical' if r_low['n_pairs'] == r_high['n_pairs'] and r_low['n_assignments'] == r_high['n_assignments'] else 'MISMATCH!'} across parallelism levels).
"""
    with open(os.path.join(HERE, "SCALING_RUN.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
