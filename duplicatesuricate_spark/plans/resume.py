"""Checkpointed, resumable pipeline runs (stage B10).

North rule: "resumable from checkpoint with per-partition lineage +
metrics".  In production checkpoints are Iceberg snapshots (the
``snapshot_id`` threads through every metrics row); in the sandbox each
stage materializes to parquet under a work dir, with the parquet
``_SUCCESS`` marker as the completion manifest.  Re-running the same
pipeline over the same work dir SKIPS every completed stage (the resume is
a metadata check — no data reread, no left-anti needed for stage-level
resume; the incremental module handles row-level deltas).

A killed run leaves the incomplete stage without ``_SUCCESS``; the rerun
recomputes exactly that stage and everything after it, producing
byte-identical output (all stages are deterministic by construction).
"""

from __future__ import annotations

import time
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duplicatesuricate_spark.config import DedupConfig, DEFAULT_CONFIG
from duplicatesuricate_spark.plans.lineage import input_sha, partition_metrics


class CheckpointRunner:
    """Materialize named stages to ``<work_dir>/<stage>`` parquet; skip
    stages whose manifest (``_SUCCESS`` + matching identity stamp) already
    exists.

    The identity stamp folds ``config_stamp`` — the full pipeline config
    plus the sketch-kernel version — into every stage sha, and each stage
    sha chains the parents' shas.  Re-running over an existing work dir
    after changing any threshold / band geometry / kernel therefore
    RECOMPUTES every stage downstream of the change instead of silently
    skipping it and mixing old outputs with the new config (round-3 verdict
    item 2; the incremental path's ``sketch_universe_fingerprint`` solved
    the same bug for row-level state)."""

    def __init__(self, spark: SparkSession, work_dir: str, snapshot_id: int = 0,
                 config_stamp: str = ""):
        self.spark = spark
        self.work_dir = Path(work_dir)
        self.snapshot_id = snapshot_id
        self.config_stamp = config_stamp
        self.executed: list[str] = []
        self.skipped: list[str] = []
        self._lineage: list[str] = []

    def _path(self, stage: str) -> Path:
        return self.work_dir / stage

    def _stamp_path(self, stage: str) -> Path:
        return self.work_dir / "_stamps" / stage

    def is_done(self, stage: str, sha: str) -> bool:
        """Complete AND produced under the same identity: parquet _SUCCESS
        present, stamp file present, stamp content == this run's stage sha.
        A pre-stamp work dir (no stamp file) is treated as a mismatch — the
        safe direction is recompute."""
        if not (self._path(stage) / "_SUCCESS").exists():
            return False
        sp = self._stamp_path(stage)
        return sp.exists() and sp.read_text().strip() == sha

    def stage(self, name: str, build: Callable[[], DataFrame]) -> DataFrame:
        """Return the stage output, computing + persisting it only if its
        manifest is absent or was produced under a different config/kernel
        identity.  Always returns the MATERIALIZED table so downstream
        stages have a stable, re-readable input."""
        path = str(self._path(name))
        sha = input_sha(name, self.snapshot_id, self.config_stamp, *self._lineage)
        if self.is_done(name, sha):
            self.skipped.append(name)
        else:
            t0 = time.monotonic()
            df = build()
            df.write.mode("overwrite").parquet(path)
            wall_ms = int((time.monotonic() - t0) * 1000)
            out = self.spark.read.parquet(path)
            m = partition_metrics(out, name, sha, wall_ms, self.snapshot_id)
            m.write.mode("overwrite").parquet(str(self.work_dir / "_metrics" / name))
            sp = self._stamp_path(name)
            sp.parent.mkdir(parents=True, exist_ok=True)
            sp.write_text(sha + "\n")
            self.executed.append(name)
        self._lineage.append(f"{name}:{sha[:12]}")
        return self.spark.read.parquet(path)

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(str(self.work_dir / "_metrics" / "*"))


def run_dedup_checkpointed(
    spark: SparkSession,
    corpus: DataFrame,
    work_dir: str,
    cfg: DedupConfig = DEFAULT_CONFIG,
    snapshot_id: int = 0,
) -> dict[str, DataFrame]:
    """The flagship pipeline, stage-materialized for kill/resume.

    Stage graph (each line one parquet checkpoint):
        corpus_ids -> reps/exact_edges -> sketches -> candidates ->
        dup_pairs -> all_pairs -> assignments
    """
    from duplicatesuricate_spark.functions.sketch import with_full_sketches
    from duplicatesuricate_spark.functions.util import ensure_min_partitions
    from duplicatesuricate_spark.operators.dedup import exact_dup_edges
    from duplicatesuricate_spark.operators.lsh import (
        band_explode, candidate_pairs, simhash_block_explode,
    )
    from duplicatesuricate_spark.operators.score import score_pairs, filter_dup_pairs
    from duplicatesuricate_spark.operators.substring import exact_substring_pairs
    from duplicatesuricate_spark.operators.components import (
        connected_components, assignments_with_singletons,
    )

    # identity stamp: the full frozen config (every threshold / band
    # geometry / skew cap) + the sketch hash universe (kernel version,
    # seed, permutations) — any change invalidates stages from the first
    # one whose output could differ
    from duplicatesuricate_spark.streaming.incremental import (
        sketch_universe_fingerprint,
    )

    stamp = input_sha(repr(cfg), sketch_universe_fingerprint(cfg))
    r = CheckpointRunner(spark, work_dir, snapshot_id, config_stamp=stamp)

    corpus_ids = r.stage(
        "corpus_ids", lambda: corpus.select("doc_id", "content_sha256")
    )
    reps = r.stage("reps", lambda: exact_dup_edges(corpus)[0])
    exact_edges = r.stage("exact_edges", lambda: exact_dup_edges(corpus)[1])
    sketches = r.stage(
        "sketches",
        lambda: with_full_sketches(ensure_min_partitions(reps), cfg=cfg).select(
            "doc_id", "shingles", "minhash", "simhash"
        ),
    )
    cands = r.stage(
        "candidates",
        lambda: candidate_pairs(
            band_explode(sketches, cfg).unionByName(
                simhash_block_explode(sketches, cfg)
            ),
            cfg,
        ),
    )
    near = r.stage(
        "near_pairs",
        lambda: filter_dup_pairs(score_pairs(cands, sketches, cfg), sketches, cfg),
    )
    sub = r.stage("substring_pairs", lambda: exact_substring_pairs(reps, cfg))
    all_pairs = r.stage(
        "all_pairs",
        lambda: near.select("id_a", "id_b")
        .unionByName(sub.select("id_a", "id_b"))
        .unionByName(exact_edges.select("id_a", "id_b"))
        .distinct(),
    )
    assignments = r.stage(
        "assignments",
        lambda: assignments_with_singletons(
            corpus_ids, connected_components(all_pairs)
        ),
    )
    return {
        "assignments": assignments,
        "pairs": all_pairs,
        "metrics": r.metrics(),
        "_runner": r,
    }
