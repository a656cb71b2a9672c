"""Corpus source (stage B1).

The reference has no readers at all — its target table is an injected
in-memory pandas DataFrame (duplicatesuricate/connectors.py:7-14,
linker.py:163-164).  Here the corpus is an Iceberg-shaped table
``(repo string, path string, commit string, lang string, content string)``
(BASELINE.json input_hint).  In production it is an Iceberg scan (snapshot
pruning + partition pruning come from table metadata); in the sandbox a
parquet directory stands in behind the same function.

Identity:
  * ``doc_id = xxhash64(repo, path, commit)`` — a stable 64-bit key minted
    at scan time (the pandas index of the reference, made explicit).
  * ``content_sha256 = sha2(content, 256)`` — the per-row invariant carried
    through every stage end-to-end (BASELINE.json input_hint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def read_corpus(
    spark: SparkSession,
    location: str,
    fmt: str = "parquet",
    snapshot_id: int | None = None,
) -> DataFrame:
    """Scan the corpus table and mint identity columns.

    ``fmt='iceberg'`` reads an Iceberg table name (time-travel via
    ``snapshot_id``); anything else is treated as a spark.read format on a
    path.  Column pruning / predicate pushdown are Catalyst's job — this
    function only declares the scan.
    """
    if fmt == "iceberg":
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        df = reader.load(location)
    else:
        df = spark.read.format(fmt).load(location)
    missing = [c for c in CORPUS_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"corpus at {location} missing columns {missing}")
    return with_doc_identity(df.select(*CORPUS_COLUMNS))


def with_doc_identity(df: DataFrame) -> DataFrame:
    """Mint ``doc_id`` and ``content_sha256`` on an already-shaped corpus."""
    return df.withColumn(
        "doc_id", F.xxhash64("repo", "path", "commit")
    ).withColumn("content_sha256", F.sha2(F.col("content"), 256))


def documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's ``documents`` table (doc_id, text, lang, source,
    n_chars — see TESTDATA.md) to the corpus shape, so every pipeline stage
    can run on the provided test tables unchanged."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = d.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
        F.sha2(F.concat_ws("|", "source", F.col("doc_id").cast("string")), 256)
        .substr(1, 40)
        .alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
    return with_doc_identity(corpus)
