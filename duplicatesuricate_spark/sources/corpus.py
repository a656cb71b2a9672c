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

from pyspark.sql import DataFrame, SparkSession, Window
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
        from duplicatesuricate_spark.sources.sinks import require_iceberg

        require_iceberg(spark)
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
    """Mint ``doc_id`` and ``content_sha256`` on an already-shaped corpus.

    ``doc_id`` is a 64-bit hash of the natural key.  At 10^12 rows the
    birthday bound gives ~tens of thousands of expected collisions
    (n^2 / 2^65), each silently merging two unrelated documents into one
    graph node — run :func:`resolve_id_collisions` at ingest on corpora
    above ~10^9 rows (one extra key-only shuffle) to make ids unique."""
    return df.withColumn(
        "doc_id", F.xxhash64("repo", "path", "commit")
    ).withColumn("content_sha256", F.sha2(F.col("content"), 256))


def resolve_id_collisions(corpus: DataFrame) -> DataFrame:
    """Deterministically repair 64-bit ``doc_id`` collisions.

    Cost model at 10^12 rows: one groupBy on the 8-byte key (map-side
    partial aggregation, key-only shuffle) finds the colliding ids —
    ~27k expected, so the set broadcasts — and only the hit rows pay a
    window; everyone else passes through untouched.  Re-minted ids mix the
    collision rank into the hash, so output ids are unique and stable
    across runs (the window orders by the natural key).  Second-order
    collisions of the re-hash are ~(27k)^2 / 2^65 ~ 0.

    The alternative — 128-bit identity (two longs or a 32-char hex key)
    everywhere — doubles pair-table width for a failure mode this repairs
    exactly; natural keys stay in the corpus table for final joins.
    """
    colliding = (
        corpus.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .select("doc_id")
    )
    # no forced broadcast: hash collisions alone (~27k at 10^12 rows) would
    # broadcast fine, but duplicate NATURAL keys (re-ingested snapshots)
    # also land here and can be millions of rows — let AQE pick broadcast
    # vs shuffle from the observed size (round-2 advice)
    clean = corpus.join(colliding, "doc_id", "left_anti")
    hit = corpus.join(colliding, "doc_id", "left_semi")
    # content_sha256 tiebreaker makes the ordering total when natural keys
    # repeat with different contents; rows identical in BOTH natural key
    # and content are interchangeable, so their rank assignment is
    # output-equivalent across runs.  Corpora without a content column
    # (key-only repair) order by the natural key alone — rows identical in
    # the full natural key are then interchangeable by definition.
    order = ["repo", "path", "commit"]
    if "content_sha256" in corpus.columns:
        order.append("content_sha256")
    elif "content" in corpus.columns:
        order.append("content")
    w = Window.partitionBy("doc_id").orderBy(*order)
    fixed = (
        hit.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "doc_id",
            F.when(F.col("rn") == 1, F.col("doc_id")).otherwise(
                F.xxhash64("repo", "path", "commit", F.col("rn"))
            ),
        )
        .drop("rn")
    )
    return clean.unionByName(fixed)


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
