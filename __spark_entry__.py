"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship near-dup pipeline on sf0.001.
``queries()`` exposes one callable per implemented operator (SURVEY.md §2 +
the training-data-pipeline set); ``oracle_sql()`` gives the DuckDB-
runnable equivalent for every SQL-expressible one.  Column names and
rounded values are engineered to match the oracles exactly (md5 — not
xxhash64 — for fingerprints; ``round(x, 6)`` on every ratio; ``coalesce``
for DuckDB's NULL-on-empty ``array_to_string``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duplicatesuricate_spark.config import DEFAULT_CONFIG
from duplicatesuricate_spark.functions.kernels import exact_score, levenshtein_ratio
from duplicatesuricate_spark.operators.dedup import dedup_pipeline
from duplicatesuricate_spark.operators.linkage import (
    canonical_pairs,
    majority_vote,
)
from duplicatesuricate_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    lsh_topk,
)
from duplicatesuricate_spark.operators.substring import exact_substring_pairs
from duplicatesuricate_spark.operators.lsh import portable_simhash_pairs
from duplicatesuricate_spark.operators.textqa import (
    fingerprints,
    language_id,
    ngram_jaccard_pairs,
    quality_scores,
    repetition_signals,
    token_counts,
)
from duplicatesuricate_spark.sources.corpus import documents_as_corpus


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# --------------------------------------------------------------- flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full near-dup detection + clustering over the sf0.001
    documents table (adapted to the corpus shape), returning the
    assignments joined with cluster sizes."""
    corpus = documents_as_corpus(spark, "/root/testdata/sf0.001")
    res = dedup_pipeline(corpus)
    sizes = res.assignments.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return res.assignments.join(sizes, "cluster_id").select(
        "doc_id", "content_sha256", "cluster_id", "cluster_size"
    )


# ---------------------------------------------------------------- queries


def _q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A5 exact channel: representative per byte-identical text.

    Windows by ``sha2(text, 256)`` — the production pre-pass key
    (operators/dedup.py:56) — so the shuffle moves 32-byte digests, not
    whole document bodies; grouping is identical to text equality modulo
    sha collisions (none at any sf, and none expected this side of 2^128).
    """
    d = _docs(spark, sf_dir)
    w = Window.partitionBy(F.sha2("text", 256))
    return d.select(
        "doc_id", F.min("doc_id").over(w).alias("rep_id")
    )


def _q_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup groups with planted byte-identical copies (round-1 fix:
    the raw documents table has no exact text dups at any sf, so the query
    was vacuously green at 0 == 0; three planted copies give the
    rows/schema/hash check teeth)."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    planted = d.where(F.col("doc_id") < 3).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
    )
    return (
        d.unionByName(planted)
        .groupBy("text")
        .agg(F.min("doc_id").alias("rep_id"), F.count(F.lit(1)).alias("n_copies"))
        .where(F.col("n_copies") > 1)
        .select("rep_id", "n_copies")
    )


def _q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_counts(_docs(spark, sf_dir))


def _q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_scores(_docs(spark, sf_dir))


def _q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id(_docs(spark, sf_dir))


def _q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprints(_docs(spark, sf_dir))


def _q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(_docs(spark, sf_dir), k=5, threshold=0.3, max_df=256)


def _q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_signals(_docs(spark, sf_dir), k=3)


def _q_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thresholds tightened vs the operator defaults so the verdict SPLITS
    the synthetic corpus (~median unique-token ratio) — an all-true keep
    column would be a vacuous contract check."""
    from duplicatesuricate_spark.operators.textqa import gopher_filter

    return gopher_filter(
        _docs(spark, sf_dir), k=3, min_tokens=20, min_unique_token_ratio=0.45
    )


def _q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duplicatesuricate_spark.operators.textqa import winnow_fingerprints

    return winnow_fingerprints(_docs(spark, sf_dir), k=5, w=4)


def _q_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duplicatesuricate_spark.operators.textqa import unigram_nll

    return unigram_nll(_docs(spark, sf_dir))


def _q_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duplicatesuricate_spark.operators.sampling import deterministic_split

    return deterministic_split(
        _docs(spark, sf_dir).select("doc_id"),
        {"train": 0.8, "val": 0.1, "test": 0.1},
        salt=7,
    )


def _q_ngram_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination with the 'benchmark' drawn from the same
    corpus by a deterministic 5% id-hash sample (salt 3) — the sampled
    docs flag themselves and any train doc sharing an 8-gram (near-dups),
    so both verdict values occur."""
    from duplicatesuricate_spark.operators.sampling import deterministic_sample
    from duplicatesuricate_spark.operators.textqa import ngram_decontaminate

    docs = _docs(spark, sf_dir)
    bench = deterministic_sample(docs, 0.05, salt=3)
    return ngram_decontaminate(docs, bench, k=8)


def _q_stratified_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duplicatesuricate_spark.operators.sampling import stratified_cap

    return stratified_cap(
        _docs(spark, sf_dir).select("doc_id", "lang"), "lang", cap=100
    )


def _q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duplicatesuricate_spark.operators.textqa import tfidf_top_terms

    return tfidf_top_terms(_docs(spark, sf_dir), top_k=3)


def _q_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup report: distribution of near-dup cluster sizes from the full
    MinHash-LSH pipeline (the B11 'report' operator as an oracle-checked
    aggregate over the oracle-checked assignments)."""
    a = _q_minhash_assignments(spark, sf_dir)
    return (
        a.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
    )


def _q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return portable_simhash_pairs(
        _docs(spark, sf_dir), k=3, bits=60, n_blocks=4, hamming_threshold=3
    )


def _q_blocking_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 blocking: self-equi-join on (lang, n_chars)."""
    d = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(b, ["lang", "n_chars"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )


def _q_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/A11: fuzzy scoring over blocked pairs (the working version of the
    reference's broken fuzzyspark, utils.py:118-127)."""
    d = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars", "text")
    a, b = d.alias("a"), d.alias("b")
    pairs = (
        a.join(b, ["lang", "n_chars"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
    )
    lev = F.levenshtein(F.col("a.text"), F.col("b.text"))
    return pairs.select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        lev.alias("lev"),
        F.round(
            levenshtein_ratio(F.col("a.text"), F.col("b.text")), 6
        ).alias("lev_ratio"),
    )


def _q_similarity_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/A12: similarity table + any-score>0.3 threshold filter."""
    d = _docs(spark, sf_dir).select("doc_id", "lang", "source", "text", "n_chars")
    a, b = d.alias("a"), d.alias("b")
    pairs = (
        a.join(b, ["lang", "n_chars"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
    )
    src_exact = exact_score(F.col("a.source"), F.col("b.source"))
    txt_fuzzy = levenshtein_ratio(F.col("a.text"), F.col("b.text")) * 2 - 1
    scored = pairs.select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        F.round(src_exact, 6).alias("source_exactscore"),
        F.round(txt_fuzzy, 6).alias("text_fuzzyscore"),
    )
    return scored.where(
        F.greatest("source_exactscore", "text_fuzzyscore") > 0.3
    )


def _q_token_set_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 token-set kernel (reference ``tokenscore``, utils.py:187-201) over
    blocked pairs — oracle-checked: Jaccard of distinct lowercase token
    sets rescaled to [-1, 1].

    The token ARRAY is computed once per document BELOW the join (r06):
    ``token_score`` over raw columns tokenizes both sides once per PAIR,
    and blocked pair counts grow ~quadratically in block size while doc
    counts do not.  Per-pair work is now just intersect/union over the
    precomputed arrays — same expressions, identical values."""
    from duplicatesuricate_spark.functions.kernels import (
        _token_array, rescale_ratio,
    )

    d = _docs(spark, sf_dir).select(
        "doc_id", "lang", "n_chars", "text",
        _token_array(F.col("text")).alias("tk"),
    )
    a, b = d.alias("a"), d.alias("b")
    pairs = (
        a.join(b, ["lang", "n_chars"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
    )
    inter = F.size(F.array_intersect(F.col("a.tk"), F.col("b.tk")))
    union = F.size(F.array_union(F.col("a.tk"), F.col("b.tk")))
    jac = F.when(
        union > 0, inter.cast("double") / union.cast("double")
    ).otherwise(F.lit(0.0))
    score = F.when(
        F.col("a.text").isNull() | F.col("b.text").isNull(), F.lit(0.0)
    ).otherwise(rescale_ratio(jac * F.lit(100.0)))
    return pairs.select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        F.round(score, 6).alias("text_tokenscore"),
    )


def _q_acronym_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 acronym kernel (reference ``compare_acronym``, utils.py:237-262)
    over blocked pairs — oracle-checked: best of tokenscore(acronym(a), b)
    and tokenscore(a, acronym(b)) when both acronyms have >= 3 chars.

    Like ``token_set_pairs`` (r06): the acronym string and both token
    arrays are derived once per document BELOW the join; the per-pair work
    is two intersect/union Jaccards and a greatest — identical values."""
    from duplicatesuricate_spark.functions.kernels import (
        _token_array, acronym_expr, rescale_ratio,
    )

    d = _docs(spark, sf_dir).select(
        "doc_id", "lang", "n_chars", "text",
        _token_array(F.col("text")).alias("tk"),
        acronym_expr(F.col("text")).alias("ac"),
    ).withColumn("ak", _token_array(F.col("ac")))
    a, b = d.alias("a"), d.alias("b")
    pairs = (
        a.join(b, ["lang", "n_chars"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
    )

    def _tokscore(ta, tb):
        inter = F.size(F.array_intersect(ta, tb))
        union = F.size(F.array_union(ta, tb))
        jac = F.when(
            union > 0, inter.cast("double") / union.cast("double")
        ).otherwise(F.lit(0.0))
        return rescale_ratio(jac * F.lit(100.0))

    usable = (F.length(F.col("a.ac")) >= 3) & (F.length(F.col("b.ac")) >= 3)
    score = F.when(
        F.col("a.text").isNull() | F.col("b.text").isNull() | ~usable,
        F.lit(0.0),
    ).otherwise(
        F.greatest(
            _tokscore(F.col("a.ak"), F.col("b.tk")),
            _tokscore(F.col("a.tk"), F.col("b.ak")),
        )
    )
    return pairs.select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        F.round(score, 6).alias("text_acronymscore"),
    )


def _q_pair_canonicalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A20 on a large table: canonical distinct (supp, part) pairs."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    raw = li.select(F.col("l_suppkey").alias("x"), F.col("l_partkey").alias("y"))
    return canonical_pairs(raw, "x", "y")


def _q_majority_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A22/A26 majority: per source, most frequent lang."""
    return majority_vote(_docs(spark, sf_dir), "source", "lang")


def _q_topk_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16/A17: top-3 longest docs per lang, deterministic tiebreak."""
    d = _docs(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("lang", "doc_id", "n_chars", "rn")
    )


def _q_cluster_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A21 (reference paired_from_gid, retrain.py:5-32): gid column ->
    all intra-group canonical pairs; gid = source."""
    from duplicatesuricate_spark.operators.linkage import pairs_from_clusters

    d = _docs(spark, sf_dir).select("doc_id", "source")
    return pairs_from_clusters(d, id_col="doc_id", cluster_col="source")


def _q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    probes = e.where(F.col("vec_id") < 3)
    return brute_force_topk(e, probes, k=5).select(
        "probe_id", "vec_id", "cosine", "rank"
    )


def _q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: deterministic md5-ordered pivots, 8 cells, 3 probed —
    the oracle replicates the same pivot/assign/probe algorithm, so the
    match checks the ALGORITHM (not just recall against brute force)."""
    from duplicatesuricate_spark.operators.similarity import ivf_topk

    e = _emb(spark, sf_dir)
    probes = e.where(F.col("vec_id") < 3)
    return ivf_topk(e, probes, k=5, n_centroids=8, n_probe=3).select(
        "probe_id", "vec_id", "cosine", "rank"
    )


# ---- sketch-pipeline queries, made oracle-checkable (round-3: these four
# were rows-only `no_oracle` entries in round 2; each is now phrased so a
# DuckDB brute-force oracle reproduces the EXACT output set) ----------------


def _plain_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> pipeline corpus shape KEEPING the original doc_id.

    ``documents_as_corpus`` mints doc_id = xxhash64(natural key), which no
    SQL oracle can recompute; carrying the documents table's own doc_id
    makes every downstream id DuckDB-derivable.  (No repo/path/commit
    columns -> the pipeline's id-collision repair correctly no-ops.)"""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.col("text").alias("content"),
        F.sha2("text", 256).alias("content_sha256"),
    )


# Hamming accept channel off for the ORACLE-CHECKED pipeline queries: the
# accepted set is then exactly {candidate pairs with exact 5-gram-shingle
# Jaccard >= threshold}, which DuckDB reproduces from first principles
# (gram sets are hash-agnostic: |intersect|/|union| over distinct 5-grams
# is the same number whether grams are md5 strings or kernel hashes).
# SimHash still contributes CANDIDATES (block tables run); only its
# distance-based acceptance — not expressible in SQL — is disabled.  The
# default two-channel config stays covered by entry(), bench.py, and the
# golden-recall pytest oracles.
# jaccard_margin widened 0.10 -> 0.20 for the oracle queries: with the
# Hamming channel off, the only prefilter is the MinHash estimate >=
# threshold - margin.  A true pair with exact Jaccard just above 0.85 has
# ~1e-3 probability of estimating below 0.75 (3 sigma at 128 perms) — a
# flake if the corpus is ever regenerated.  0.65 is ~6 sigma (P < 1e-9),
# and the only cost is a few extra exact verifications at sf0.01 scale
# (round-3 advice item 4).
_ORACLE_CFG = DEFAULT_CONFIG.with_(hamming_threshold=-1, jaccard_margin=0.2)


def _q_minhash_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash-LSH dedup + connected components; cluster_id = the
    component-minimum doc_id, which the oracle recomputes with a recursive
    label-propagation CTE over its own brute-force pair set."""
    corpus = _plain_corpus(spark, sf_dir)
    res = dedup_pipeline(corpus, _ORACLE_CFG, include_substring_pass=False)
    return res.assignments.select("doc_id", "content_sha256", "cluster_id")


def _q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accepted near-dup pairs with their EXACT shingle Jaccard.  The
    oracle computes every pair with 5-gram Jaccard >= 0.85 by brute force;
    equality is therefore a measured recall-AND-precision = 1.0 statement
    for the LSH candidate stage on this corpus.

    The pipeline's exact pre-pass collapses byte-identical docs to one
    representative (star edges only) and near-dups only representatives,
    while the brute-force oracle emits ALL pairs.  So the rep-level output
    is expanded back to doc level here (round-3 advice item 3 — without
    this the equality silently relied on the corpus having no sha group of
    size >= 3 and no copy adjacent to a third doc): sha-identical groups
    become full cliques at Jaccard 1.0 (identical text -> identical gram
    set), and each rep-level near-dup pair propagates to every (copy_a,
    copy_b) combination with the rep pair's Jaccard (copies share the
    rep's gram set exactly).  Cheap at contract scale: the rep map is
    |docs| rows and the expansion joins are broadcast-sized."""
    corpus = _plain_corpus(spark, sf_dir)
    res = dedup_pipeline(corpus, _ORACLE_CFG, include_substring_pass=False)
    return expand_rep_pairs_to_doc_level(corpus, res.pairs)


def expand_rep_pairs_to_doc_level(
    corpus: DataFrame, pairs: DataFrame
) -> DataFrame:
    """Rep-level pipeline pairs -> the full doc-level >= threshold pair set
    (what a brute-force oracle emits): sha-identical cliques at Jaccard 1.0
    plus every rep near-dup pair propagated to all copy combinations."""
    m = (
        corpus.select("doc_id", "content_sha256")
        .withColumn(
            "rep_id",
            F.min("doc_id").over(Window.partitionBy("content_sha256")),
        )
        .select("doc_id", "rep_id")
    )
    near = pairs.where(F.col("kind") == "near_dup").select(
        "id_a", "id_b", "jaccard"
    )
    ma = m.select(F.col("rep_id").alias("id_a"), F.col("doc_id").alias("da"))
    mb = m.select(F.col("rep_id").alias("id_b"), F.col("doc_id").alias("db"))
    expanded = (
        near.join(ma, "id_a")
        .join(mb, "id_b")
        .select(
            F.least("da", "db").alias("id_a"),
            F.greatest("da", "db").alias("id_b"),
            "jaccard",
        )
    )
    clique = (
        m.alias("x")
        .join(m.alias("y"), "rep_id")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("id_a"),
            F.col("y.doc_id").alias("id_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return (
        expanded.unionByName(clique)
        .groupBy("id_a", "id_b")
        .agg(F.round(F.max("jaccard"), 6).alias("jaccard"))
    )


def _q_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-B9 containment with planted ground truth: every kept source
    doc is embedded in a planted self-concatenation container, and the
    oracle brute-forces the operator's own verify predicate (normalized
    token stream of the smaller doc contiguous in the larger, space
    sentinels both sides) over ALL pairs of the mini-corpus.  Equality =
    the anchored-chunk candidate stage found every true containment and
    the verifier rejected everything else.

    The driver's documents are short (<= ~90 tokens at sf0.01), so the
    query scales the chunk geometry down with it (window 12, anchor mod 4
    — a config knob, same operator); the production 50-token window runs
    in bench.py over the big synthetic corpus."""
    d = _docs(spark, sf_dir).where(
        (F.col("doc_id") < 16) & (F.col("n_chars") >= 150)
    ).select("doc_id", "text")
    planted = d.select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
        F.concat_ws(" ", "text", "text").alias("text"),
    )
    corpus = d.unionByName(planted).select(
        "doc_id",
        F.col("text").alias("content"),
        F.sha2("text", 256).alias("content_sha256"),
    )
    cfg = DEFAULT_CONFIG.with_(substring_window=12, substring_anchor_mod=4)
    return exact_substring_pairs(corpus, cfg)


def _q_ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH top-k with planted ground truth pinning recall = 1.0: five
    exact copies of each probe vector are added to the corpus, so each
    probe's true top-5 (cosine 1.0, ties broken by vec_id) sits in the
    probe's own bucket in every table — the LSH result must equal the
    brute-force oracle exactly, multiprobe path exercised."""
    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    probes = e.where(F.col("vec_id") < 3)
    corpus = e
    for i in range(5):
        corpus = corpus.unionByName(
            probes.select(
                (F.col("vec_id") + F.lit(10_000_000 * (i + 1))).alias("vec_id"),
                "embedding",
            )
        )
    return lsh_topk(
        corpus, probes, k=5, n_planes=8, dim=64, multiprobe=True
    ).select("probe_id", "vec_id", "cosine", "rank")


# ann_lsh_topk (plain LSH top-k, rows-only) was retired in round 4: it was
# the last `no_oracle` entry and is strictly subsumed by the oracle-checked
# `ann_lsh_recall`, which runs the same lsh_topk operator (multiprobe path
# included) against planted ground truth (round-3 verdict item 5).  The
# non-multiprobe path stays covered by tests/test_textqa_similarity.py.


def _q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup embedding pairs with planted exact copies (round-1 fix: the
    raw table is random vectors — max pairwise cosine ~0.51 — so threshold
    0.9 was vacuous).  Five exact copies are planted query-side; identical
    vectors share every LSH bucket in every table, so the approximate join
    recovers the full >= 0.9 pair set exactly and the query is
    oracle-checkable against DuckDB's brute-force threshold join."""
    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    planted = e.where(F.col("vec_id") < 5).select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"), "embedding"
    )
    return embedding_near_dup_pairs(
        e.unionByName(planted), threshold=0.9, n_planes=8, dim=64
    )


def _q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing over real bytes: documents' text as binary
    payloads -> Arrow feature extraction (deterministic fake codec).

    The feature vector is exploded to one scalar row per element so every
    output column is hashable by the driver's canonicalizer (round-1 fix)
    AND the whole decode path is oracle-checkable: the fake codec is
    sha256 -> little-endian uint32 words -> float32 in [0, 1), which DuckDB
    reproduces from ``sha256(text)`` hex (see oracle_sql)."""
    from duplicatesuricate_spark.operators.multimodal import extract_features

    media = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(None)
        .cast("struct<width:int,height:int,sample_rate:int,n_frames:int>")
        .alias("meta"),
    )
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "kind",
        "payload_sha256",
        F.posexplode("feature").alias("pos", "fval_raw"),
    ).select(
        "media_id",
        "kind",
        "payload_sha256",
        "pos",
        F.round(F.col("fval_raw").cast("double"), 6).alias("fval"),
    )


def _q_multimodal_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling PLAN (multimodal.frame_sample_plan): which
    frame indexes to decode per video — pure Column math on metadata,
    fully oracle-checkable.  n_frames is derived deterministically from
    n_chars so the documents table doubles as a video catalog."""
    from duplicatesuricate_spark.operators.multimodal import frame_sample_plan

    media = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.pmod(F.col("n_chars"), F.lit(300)).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
    return frame_sample_plan(media, every_n=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "exact_dedup": _q_exact_dedup,
        "dup_groups": _q_dup_groups,
        "token_counts": _q_token_counts,
        "quality_scores": _q_quality,
        "language_id": _q_language_id,
        "fingerprints": _q_fingerprints,
        "ngram_jaccard_pairs": _q_ngram_jaccard,
        "repetition_signals": _q_repetition,
        "gopher_filter": _q_gopher_filter,
        "winnow_fingerprints": _q_winnow_fingerprints,
        "unigram_nll": _q_unigram_nll,
        "deterministic_split": _q_deterministic_split,
        "ngram_decontaminate": _q_ngram_decontaminate,
        "stratified_cap": _q_stratified_cap,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "cluster_size_histogram": _q_cluster_size_histogram,
        "simhash_hamming_pairs": _q_simhash_pairs,
        "blocking_pairs": _q_blocking_pairs,
        "levenshtein_pairs": _q_levenshtein_pairs,
        "similarity_threshold": _q_similarity_threshold,
        "token_set_pairs": _q_token_set_pairs,
        "acronym_pairs": _q_acronym_pairs,
        "pair_canonicalization": _q_pair_canonicalization,
        "majority_vote": _q_majority_vote,
        "topk_window": _q_topk_window,
        "cluster_pairs": _q_cluster_pairs,
        "ann_cosine_topk": _q_ann_topk,
        "minhash_lsh_assignments": _q_minhash_assignments,
        "minhash_lsh_pairs": _q_minhash_pairs,
        "exact_substring_pairs": _q_exact_substring,
        "ann_lsh_recall": _q_ann_lsh_recall,
        "ann_ivf_topk": _q_ann_ivf_topk,
        "embedding_near_dup": _q_embedding_near_dup,
        "multimodal_features": _q_multimodal_features,
        "multimodal_frame_plan": _q_multimodal_frame_plan,
    }


# ----------------------------------------------------------------- oracles

_TOKS = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'), x -> x <> '')"
)

_GRAMS5 = f"""
    case when len({_TOKS}) >= 5
         then list_distinct([md5(array_to_string(({_TOKS})[i:i+4], ' '))
                             for i in range(1, len({_TOKS}) - 3)])
         else [md5(coalesce(array_to_string({_TOKS}, ' '), ''))] end
"""

_STOPWORDS = "['the','and','of','to','is','in','a','for','on','with','as','by']"

#: brute-force exact-Jaccard pairs -> recursive label-propagation CTEs,
#: shared by the assignments oracle and the cluster-size-histogram report
#: oracle (both read the final ``lbl`` relation)
_ASSIGN_CTES = f"""
            with recursive
            g0 as (select doc_id, {_GRAMS5} as gs from documents),
            gx as (select doc_id, unnest(gs) as gram from g0),
            sizes as (select doc_id, count(*) as n from gx group by doc_id),
            m as (
              select a.doc_id as id_a, b.doc_id as id_b, count(*) as shared
              from gx a join gx b using (gram)
              where a.doc_id < b.doc_id
              group by 1, 2
            ),
            p as (
              select id_a, id_b
              from m
              join sizes sa on sa.doc_id = id_a
              join sizes sb on sb.doc_id = id_b
              where shared / (sa.n + sb.n - shared) >= 0.85
            ),
            e as (
              select id_a as u, id_b as v from p
              union all
              select id_b as u, id_a as v from p
            ),
            lbl(doc_id, label) as (
              select doc_id, doc_id from documents
              union
              select e.u, l.label from e join lbl l on l.doc_id = e.v
            )
"""


def _sql_tokset(expr: str) -> str:
    """Distinct lowercase token set of ``expr`` — mirrors
    ``kernels._token_array`` (sort dropped: only set ops follow)."""
    return (
        f"list_distinct(list_filter(string_split_regex(lower({expr}), "
        f"'[^a-z0-9_]+'), x -> x <> ''))"
    )


def _sql_acronym(expr: str) -> str:
    """First char of each whitespace token — mirrors ``kernels.acronym_expr``."""
    return (
        f"array_to_string(list_transform(list_filter(string_split_regex("
        f"{expr}, '\\s+'), x -> x <> ''), x -> substring(x, 1, 1)), '')"
    )


def _sql_tokscore(ta: str, tb: str) -> str:
    """Jaccard of two token-set lists rescaled to [-1,1] — mirrors
    ``kernels.token_score`` minus its null gate (applied by callers)."""
    inter = f"len(list_intersect({ta}, {tb}))"
    union = f"(len({ta}) + len({tb}) - {inter})"
    jac = (
        f"(case when {union} > 0 then {inter}::DOUBLE / {union}::DOUBLE "
        f"else 0.0 end)"
    )
    return f"(({jac} * 100.0) / 50.0 - 1.0)"

_LANG_CASE = """
      case when h_de >= h_en and h_de >= h_es and h_de >= h_fr then 'de'
           when h_en >= h_es and h_en >= h_fr then 'en'
           when h_es >= h_fr then 'es'
           else 'fr' end
"""


def oracle_sql() -> dict[str, str]:
    return {
        "exact_dedup": """
            select doc_id, min(doc_id) over (partition by text) as rep_id
            from documents
        """,
        "dup_groups": """
            with u as (
              select doc_id, text from documents
              union all
              select doc_id + 10000000 as doc_id, text
              from documents where doc_id < 3
            )
            select min(doc_id) as rep_id, count(*) as n_copies
            from u group by text having count(*) > 1
        """,
        "token_counts": """
            select doc_id,
                   len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
                       as ws_tokens,
                   len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
                       as bpe_tokens,
                   length(lower(text)) as n_chars_norm
            from documents
        """,
        "quality_scores": f"""
            with t as (
              select doc_id, text, {_TOKS} as tk,
                     length(regexp_replace(lower(text), '[^a-z]', '', 'g')) as alpha_chars
              from documents
            ), m as (
              select doc_id,
                     len(tk) as n_tokens,
                     case when len(tk) > 0 then alpha_chars / len(tk) else 0.0 end as mean_word_len,
                     case when len(tk) > 0
                          then len(list_filter(tk, x -> list_contains({_STOPWORDS}, x))) / len(tk)
                          else 0.0 end as stopword_ratio,
                     case when length(text) > 0 then alpha_chars / length(text) else 0.0 end as alpha_ratio
              from t
            )
            select doc_id, n_tokens,
                   round(mean_word_len, 6) as mean_word_len,
                   round(stopword_ratio, 6) as stopword_ratio,
                   round(alpha_ratio, 6) as alpha_ratio,
                   round((case when n_tokens >= 10 and mean_word_len >= 2.0 and mean_word_len <= 12.0
                               then 0.5 else 0.0 end)
                         + least(stopword_ratio * 2, 0.25)
                         + least(alpha_ratio, 0.25), 6) as quality
            from m
        """,
        "language_id": f"""
            with t as (select doc_id, {_TOKS} as tk from documents),
            h as (
              select doc_id,
                len(list_filter(tk, x -> list_contains(['the','and','of','to','is','in'], x))) as h_en,
                len(list_filter(tk, x -> list_contains(['der','die','und','das','ist','nicht'], x))) as h_de,
                len(list_filter(tk, x -> list_contains(['el','la','que','los','una','por'], x))) as h_es,
                len(list_filter(tk, x -> list_contains(['le','les','des','une','est','dans'], x))) as h_fr
              from t
            )
            select doc_id, {_LANG_CASE} as lang_pred,
                   greatest(h_en, h_de, h_es, h_fr) as lang_hits
            from h
        """,
        "fingerprints": f"""
            with t as (select doc_id, {_TOKS} as tk, text from documents)
            select doc_id,
                   list_min(case when len(tk) >= 5
                        then [md5(array_to_string(tk[i:i+4], ' '))
                              for i in range(1, len(tk) - 3)]
                        else [md5(coalesce(array_to_string(tk, ' '), ''))] end)
                       as fingerprint,
                   len(tk) as n_tokens
            from t
        """,
        "ngram_jaccard_pairs": f"""
            with g0 as (select doc_id, {_GRAMS5} as gs from documents),
            gx as (select doc_id, unnest(gs) as gram from g0),
            keep as (select gram from gx group by gram having count(*) <= 256),
            g as (select gx.* from gx join keep using (gram)),
            sizes as (select doc_id, count(*) as n_grams from g group by doc_id),
            m as (
              select a.doc_id as id_a, b.doc_id as id_b, count(*) as shared
              from g a join g b using (gram)
              where a.doc_id < b.doc_id
              group by 1, 2
            )
            select id_a, id_b, shared,
                   round(shared / (sa.n_grams + sb.n_grams - shared), 6) as jaccard
            from m
            join sizes sa on sa.doc_id = id_a
            join sizes sb on sb.doc_id = id_b
            where round(shared / (sa.n_grams + sb.n_grams - shared), 6) >= 0.3
        """,
        "repetition_signals": f"""
            with toks as (select doc_id, {_TOKS} as t from documents),
            tc as (
              select doc_id, tok, count(*) as c
              from (select doc_id, unnest(t) as tok from toks)
              group by 1, 2
            ),
            freq as (
              select doc_id, sum(c)::BIGINT as n, count(*)::BIGINT as n_uniq,
                     max(c)::BIGINT as top
              from tc group by 1
            ),
            gram as (
              select doc_id,
                     case when len(t) >= 3
                          then list_transform(range(1, len(t) - 1),
                                              i -> array_to_string(t[i:i+2], ' '))
                          else null end as g
              from toks
            )
            select toks.doc_id,
                   coalesce(f.n, 0) as n_tokens,
                   case when coalesce(f.n, 0) > 0
                        then round(f.n_uniq / f.n, 6) else 0.0 end
                       as unique_token_ratio,
                   case when coalesce(f.n, 0) > 0
                        then round(f.top / f.n, 6) else 0.0 end
                       as top_token_frac,
                   case when gram.g is not null
                        then round(1.0 - len(list_distinct(gram.g)) / len(gram.g), 6)
                        else 0.0 end as dup_gram_frac
            from toks
            join gram using (doc_id)
            left join freq f on f.doc_id = toks.doc_id
        """,
        "gopher_filter": f"""
            with t as (
              select doc_id, text, {_TOKS} as tk,
                     length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                         as alpha_chars
              from documents
            ),
            q as (
              select doc_id,
                     len(tk) as n_tokens,
                     round(case when len(tk) > 0
                                then alpha_chars / len(tk) else 0.0 end, 6)
                         as mean_word_len,
                     round(case when length(text) > 0
                                then alpha_chars / length(text) else 0.0 end, 6)
                         as alpha_ratio
              from t
            ),
            tc as (
              select doc_id, tok, count(*) as c
              from (select doc_id, unnest(tk) as tok from t)
              group by 1, 2
            ),
            freq as (
              select doc_id, sum(c)::BIGINT as n, count(*)::BIGINT as n_uniq,
                     max(c)::BIGINT as top
              from tc group by 1
            ),
            gram as (
              select doc_id,
                     case when len(tk) >= 3
                          then list_transform(range(1, len(tk) - 1),
                                              i -> array_to_string(tk[i:i+2], ' '))
                          else null end as g
              from t
            ),
            r as (
              select t.doc_id,
                     round(case when coalesce(f.n, 0) > 0
                                then f.n_uniq / f.n else 0.0 end, 6)
                         as unique_token_ratio,
                     round(case when coalesce(f.n, 0) > 0
                                then f.top / f.n else 0.0 end, 6)
                         as top_token_frac,
                     case when gram.g is not null
                          then round(1.0 - len(list_distinct(gram.g))
                                     / len(gram.g), 6)
                          else 0.0 end as dup_gram_frac
              from t
              join gram using (doc_id)
              left join freq f on f.doc_id = t.doc_id
            )
            select q.doc_id,
                   (q.n_tokens >= 20 and q.n_tokens <= 200000) as flag_len,
                   (q.mean_word_len >= 2.0 and q.mean_word_len <= 12.0)
                       as flag_word_len,
                   (q.alpha_ratio >= 0.5) as flag_alpha,
                   (r.top_token_frac <= 0.3) as flag_top_token,
                   (r.unique_token_ratio >= 0.45) as flag_unique,
                   (r.dup_gram_frac <= 0.5) as flag_dup_gram,
                   (q.n_tokens >= 20 and q.n_tokens <= 200000
                    and q.mean_word_len >= 2.0 and q.mean_word_len <= 12.0
                    and q.alpha_ratio >= 0.5
                    and r.top_token_frac <= 0.3
                    and r.unique_token_ratio >= 0.45
                    and r.dup_gram_frac <= 0.5) as keep
            from q join r using (doc_id)
        """,
        "winnow_fingerprints": f"""
            with t as (select doc_id, {_TOKS} as tk from documents),
            g as (
              select doc_id,
                     case when len(tk) >= 5
                          then [md5(array_to_string(tk[i:i+4], ' '))
                                for i in range(1, len(tk) - 3)]
                          else [md5(coalesce(array_to_string(tk, ' '), ''))]
                     end as gr
              from t
            ),
            s as (
              select doc_id,
                     case when len(gr) >= 4
                          then list_distinct(
                              [list_aggregate(gr[j:j+3], 'min')
                               for j in range(1, len(gr) - 2)])
                          else [list_aggregate(gr, 'min')]
                     end as sel
              from g
            )
            select doc_id, unnest(sel) as fingerprint from s
        """,
        "unigram_nll": f"""
            with t as (
              select doc_id, unnest({_TOKS}) as tok from documents
            ),
            v as (select tok, count(*) as c from t group by 1),
            n as (select sum(c) as total from v),
            d as (
              select t.doc_id, count(*)::BIGINT as n_tokens,
                     avg(ln(v.c)) as mlc
              from t join v using (tok)
              group by 1
            )
            select doc_id, n_tokens,
                   round(ln((select total from n)) - mlc, 6) as unigram_nll
            from d
        """,
        "deterministic_split": """
            select doc_id,
                   case when ((doc_id + 7) * 2654435761) % 4294967296
                             % 10000 < 8000 then 'train'
                        when ((doc_id + 7) * 2654435761) % 4294967296
                             % 10000 < 9000 then 'val'
                        else 'test' end as split
            from documents
        """,
        "ngram_decontaminate": f"""
            with t as (select doc_id, {_TOKS} as tk from documents),
            g as (
              select doc_id,
                     case when len(tk) >= 8
                          then list_distinct(
                              [md5(array_to_string(tk[i:i+7], ' '))
                               for i in range(1, len(tk) - 6)])
                          else [md5(coalesce(array_to_string(tk, ' '), ''))]
                     end as gr
              from t
            ),
            bench as (
              select doc_id from documents
              where ((doc_id + 3) * 2654435761) % 4294967296 % 10000 < 500
            ),
            bg as (
              select distinct unnest(gr) as gram
              from g join bench using (doc_id)
            ),
            tg as (select doc_id, unnest(gr) as gram from g),
            hits as (
              select doc_id, count(*)::BIGINT as contaminated_grams
              from tg join bg using (gram) group by 1
            )
            select d.doc_id,
                   coalesce(h.contaminated_grams, 0)::BIGINT
                       as contaminated_grams,
                   coalesce(h.contaminated_grams, 0) > 0 as contaminated
            from documents d left join hits h using (doc_id)
        """,
        "tfidf_top_terms": f"""
            with t as (
              select doc_id, unnest({_TOKS}) as term from documents
            ),
            tf as (
              select doc_id, term, count(*) as c from t group by 1, 2
            ),
            ntok as (select doc_id, sum(c) as n from tf group by 1),
            dfreq as (select term, count(*) as df from tf group by 1),
            nd as (select count(distinct doc_id) as n_docs from tf),
            scored as (
              select tf.doc_id, tf.term,
                     round((tf.c::DOUBLE / ntok.n)
                           * ln((select n_docs from nd)::DOUBLE / dfreq.df),
                           6) as tfidf
              from tf join ntok using (doc_id) join dfreq using (term)
            )
            select doc_id, term, tfidf, rank from (
              select doc_id, term, tfidf,
                     row_number() over (partition by doc_id
                                        order by tfidf desc, term) as rank
              from scored
            ) where rank <= 3
        """,
        "stratified_cap": """
            select doc_id, lang from (
              select doc_id, lang,
                     row_number() over (
                       partition by lang
                       order by (doc_id * 2654435761) % 4294967296 % 10000,
                                doc_id) as rn
              from documents
            ) where rn <= 100
        """,
        "simhash_hamming_pairs": f"""
            with toks as (select doc_id, {_TOKS} as t from documents),
            grams as (
              select doc_id,
                     case when len(t) >= 3
                          then list_transform(range(1, len(t) - 1),
                                              i -> array_to_string(t[i:i+2], ' '))
                          else [coalesce(array_to_string(t, ' '), '')] end as g
              from toks
            ),
            hs as (
              select doc_id,
                     list_transform(g, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT)
                         as h
              from grams
            ),
            sh as (
              select doc_id,
                     list_reduce(
                       list_transform(range(0, 60), b ->
                         case when 2 * len(list_filter(h, x -> ((x >> b) & 1) = 1))
                                  > len(h)
                              then (1::BIGINT << b) else 0::BIGINT end),
                       (a, b) -> a + b) as simhash
              from hs
            ),
            blocks as (
              select doc_id, simhash, j, (simhash >> (15 * j)) & 32767 as blk
              from sh, unnest(range(0, 4)) as u(j)
            ),
            cand as (
              select distinct a.doc_id as id_a, b.doc_id as id_b
              from blocks a
              join blocks b on a.j = b.j and a.blk = b.blk and a.doc_id < b.doc_id
            )
            select c.id_a, c.id_b,
                   bit_count(xor(sa.simhash, sb.simhash))::INT as hamming
            from cand c
            join sh sa on sa.doc_id = c.id_a
            join sh sb on sb.doc_id = c.id_b
            where bit_count(xor(sa.simhash, sb.simhash)) <= 3
        """,
        "blocking_pairs": """
            select a.doc_id as id_a, b.doc_id as id_b
            from documents a join documents b
              on a.lang = b.lang and a.n_chars = b.n_chars
            where a.doc_id < b.doc_id
        """,
        "levenshtein_pairs": """
            select a.doc_id as id_a, b.doc_id as id_b,
                   levenshtein(a.text, b.text) as lev,
                   round(1.0 - levenshtein(a.text, b.text)
                         / greatest(length(a.text), length(b.text), 1), 6) as lev_ratio
            from documents a join documents b
              on a.lang = b.lang and a.n_chars = b.n_chars
            where a.doc_id < b.doc_id
        """,
        "similarity_threshold": """
            with s as (
              select a.doc_id as id_a, b.doc_id as id_b,
                     round(case when a.source is null or b.source is null then 0.0
                                when a.source = b.source then 1.0 else -1.0 end, 6)
                         as source_exactscore,
                     round((1.0 - levenshtein(a.text, b.text)
                            / greatest(length(a.text), length(b.text), 1)) * 2 - 1, 6)
                         as text_fuzzyscore
              from documents a join documents b
                on a.lang = b.lang and a.n_chars = b.n_chars
              where a.doc_id < b.doc_id
            )
            select * from s
            where greatest(source_exactscore, text_fuzzyscore) > 0.3
        """,
        "token_set_pairs": f"""
            with t as (
              select doc_id, lang, n_chars, text,
                     {_sql_tokset('text')} as tk
              from documents
            )
            select a.doc_id as id_a, b.doc_id as id_b,
                   round(case when a.text is null or b.text is null then 0.0
                              else {_sql_tokscore('a.tk', 'b.tk')} end, 6)
                       as text_tokenscore
            from t a join t b on a.lang = b.lang and a.n_chars = b.n_chars
            where a.doc_id < b.doc_id
        """,
        "acronym_pairs": f"""
            with t0 as (
              select doc_id, lang, n_chars, text,
                     {_sql_tokset('text')} as tk,
                     {_sql_acronym('text')} as ac
              from documents
            ),
            t as (select *, {_sql_tokset('ac')} as ak from t0)
            select a.doc_id as id_a, b.doc_id as id_b,
                   round(case when a.text is null or b.text is null
                                or length(a.ac) < 3 or length(b.ac) < 3
                              then 0.0
                              else greatest({_sql_tokscore('a.ak', 'b.tk')},
                                            {_sql_tokscore('a.tk', 'b.ak')})
                         end, 6) as text_acronymscore
            from t a join t b on a.lang = b.lang and a.n_chars = b.n_chars
            where a.doc_id < b.doc_id
        """,
        "pair_canonicalization": """
            select distinct least(l_suppkey, l_partkey) as id_a,
                            greatest(l_suppkey, l_partkey) as id_b
            from lineitem
            where l_suppkey <> l_partkey
        """,
        "majority_vote": """
            with c as (
              select source, lang, count(*) as n
              from documents group by source, lang
            ), r as (
              select source, lang, n,
                     row_number() over (partition by source
                                        order by n desc, lang asc) as rn
              from c
            )
            select source, lang as majority, n as votes from r where rn = 1
        """,
        "topk_window": """
            with r as (
              select lang, doc_id, n_chars,
                     row_number() over (partition by lang
                                        order by n_chars desc, doc_id asc) as rn
              from documents
            )
            select lang, doc_id, n_chars, rn from r where rn <= 3
        """,
        "cluster_pairs": """
            select a.doc_id as id_a, b.doc_id as id_b
            from documents a join documents b on a.source = b.source
            where a.doc_id < b.doc_id
        """,
        "minhash_lsh_pairs": f"""
            with g0 as (select doc_id, {_GRAMS5} as gs from documents),
            gx as (select doc_id, unnest(gs) as gram from g0),
            sizes as (select doc_id, count(*) as n from gx group by doc_id),
            m as (
              select a.doc_id as id_a, b.doc_id as id_b, count(*) as shared
              from gx a join gx b using (gram)
              where a.doc_id < b.doc_id
              group by 1, 2
            )
            select id_a, id_b,
                   round(shared / (sa.n + sb.n - shared), 6) as jaccard
            from m
            join sizes sa on sa.doc_id = id_a
            join sizes sb on sb.doc_id = id_b
            where shared / (sa.n + sb.n - shared) >= 0.85
        """,
        "minhash_lsh_assignments": f"""
            {_ASSIGN_CTES}
            select d.doc_id, sha256(d.text) as content_sha256,
                   min(l.label) as cluster_id
            from documents d join lbl l on l.doc_id = d.doc_id
            group by 1, 2
        """,
        "cluster_size_histogram": f"""
            {_ASSIGN_CTES}
            , asg as (
              select d.doc_id, min(l.label) as cluster_id
              from documents d join lbl l on l.doc_id = d.doc_id
              group by 1
            ),
            cs as (
              select cluster_id, count(*)::BIGINT as cluster_size
              from asg group by 1
            )
            select cluster_size, count(*)::BIGINT as n_clusters
            from cs group by 1
        """,
        "exact_substring_pairs": """
            with d as (select doc_id, text from documents
                       where doc_id < 16 and n_chars >= 150),
            u as (
              select doc_id, text from d
              union all
              select doc_id + 10000000 as doc_id, text || ' ' || text as text
              from d
            ),
            n as (
              select doc_id,
                     ' ' || array_to_string(
                         list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
                                     x -> x <> ''), ' ') || ' ' as nt
              from u
            )
            select a.doc_id as id_a, b.doc_id as id_b
            from n a join n b on a.doc_id < b.doc_id
            where case when length(a.nt) <= length(b.nt)
                       then strpos(b.nt, a.nt) > 0
                       else strpos(a.nt, b.nt) > 0 end
        """,
        "ann_lsh_recall": """
            with p as (select vec_id as probe_id, embedding::DOUBLE[] as pv
                       from embeddings where vec_id < 3),
            c as (
              select vec_id, embedding::DOUBLE[] as v from embeddings
              union all
              select vec_id + 10000000 * (r.i + 1) as vec_id,
                     embedding::DOUBLE[] as v
              from embeddings, range(0, 5) r(i)
              where vec_id < 3
            ),
            s as (
              select p.probe_id, c.vec_id,
                     round(
                       list_sum(list_transform(list_zip(c.v, p.pv), z -> z[1] * z[2]))
                       / (sqrt(list_sum(list_transform(c.v, x -> x*x)))
                          * sqrt(list_sum(list_transform(p.pv, x -> x*x)))), 6)
                         as cosine
              from c cross join p
              where c.vec_id <> p.probe_id
            ), r as (
              select probe_id, vec_id, cosine,
                     row_number() over (partition by probe_id
                                        order by cosine desc, vec_id asc) as rank
              from s
            )
            select probe_id, vec_id, cosine, rank from r where rank <= 5
        """,
        "ann_ivf_topk": """
            with piv as (
              select vec_id as cid, embedding::DOUBLE[] as cvec
              from embeddings
              order by md5(cast(vec_id as varchar)), vec_id
              limit 8
            ),
            e as (select vec_id, embedding::DOUBLE[] as v from embeddings),
            ac as (
              select e.vec_id, piv.cid,
                     list_sum(list_transform(list_zip(e.v, piv.cvec),
                                             z -> z[1] * z[2]))
                     / (sqrt(list_sum(list_transform(e.v, x -> x*x)))
                        * sqrt(list_sum(list_transform(piv.cvec, x -> x*x))))
                         as ccos
              from e cross join piv
            ),
            assign as (
              select vec_id, cid from (
                select vec_id, cid,
                       row_number() over (partition by vec_id
                                          order by ccos desc, cid asc) as rn
                from ac) where rn = 1
            ),
            pc as (
              select probe_id, cid from (
                select a.vec_id as probe_id, a.cid,
                       row_number() over (partition by a.vec_id
                                          order by a.ccos desc, a.cid asc) as rn
                from ac a where a.vec_id < 3) where rn <= 3
            ),
            s as (
              select pc.probe_id, ass.vec_id,
                     round(
                       list_sum(list_transform(list_zip(pv.v, ev.v),
                                               z -> z[1] * z[2]))
                       / (sqrt(list_sum(list_transform(pv.v, x -> x*x)))
                          * sqrt(list_sum(list_transform(ev.v, x -> x*x)))), 6)
                         as cosine
              from pc
              join assign ass on ass.cid = pc.cid
              join e ev on ev.vec_id = ass.vec_id
              join e pv on pv.vec_id = pc.probe_id
              where ass.vec_id <> pc.probe_id
            )
            select probe_id, vec_id, cosine, rank from (
              select probe_id, vec_id, cosine,
                     row_number() over (partition by probe_id
                                        order by cosine desc, vec_id asc) as rank
              from s) where rank <= 5
        """,
        "embedding_near_dup": """
            with e0 as (select vec_id, embedding from embeddings),
            planted as (select vec_id + 10000000 as vec_id, embedding
                        from embeddings where vec_id < 5),
            e as (select vec_id, embedding::DOUBLE[] as v from e0
                  union all
                  select vec_id, embedding::DOUBLE[] as v from planted),
            s as (
              select a.vec_id as id_a, b.vec_id as id_b,
                     round(
                       list_sum(list_transform(list_zip(a.v, b.v), z -> z[1] * z[2]))
                       / (sqrt(list_sum(list_transform(a.v, x -> x*x)))
                          * sqrt(list_sum(list_transform(b.v, x -> x*x)))), 6)
                         as cosine
              from e a join e b on a.vec_id < b.vec_id
            )
            select id_a, id_b, cosine from s where cosine >= 0.9
        """,
        "multimodal_features": """
            with t as (select doc_id as media_id, 'image' as kind,
                              sha256(text) as h
                       from documents),
            u as (
              select media_id, kind, h,
                [ list_sum([
                    ((strpos('0123456789abcdef', substr(h, 2*(4*w+j)+1, 1)) - 1) * 16
                     + (strpos('0123456789abcdef', substr(h, 2*(4*w+j)+2, 1)) - 1)
                    ) * (256**j)
                    for j in [0,1,2,3]])
                  for w in [0,1,2,3,4,5,6,7] ] as words
              from t
            )
            select media_id, kind, h as payload_sha256, (r.pos)::INT as pos,
                   round(((words[(r.pos % 8) + 1] / 4294967296.0)::FLOAT)::DOUBLE, 6)
                       as fval
            from u cross join range(0, 16) r(pos)
        """,
        "multimodal_frame_plan": """
            with v as (
              select doc_id as media_id, (n_chars % 300)::INT as n_frames
              from documents
            )
            select media_id, unnest(range(0, n_frames, 10))::INT as frame_index
            from v where n_frames > 0
        """,
        "ann_cosine_topk": """
            with p as (select vec_id as probe_id, embedding as pv
                       from embeddings where vec_id < 3),
            s as (
              select p.probe_id, e.vec_id,
                     round(
                       list_sum(list_transform(list_zip(e.embedding::DOUBLE[], p.pv::DOUBLE[]),
                                               z -> z[1] * z[2]))
                       / (sqrt(list_sum(list_transform(e.embedding::DOUBLE[], x -> x*x)))
                          * sqrt(list_sum(list_transform(p.pv::DOUBLE[], x -> x*x)))), 6)
                         as cosine
              from embeddings e cross join p
              where e.vec_id <> p.probe_id
            ), r as (
              select probe_id, vec_id, cosine,
                     row_number() over (partition by probe_id
                                        order by cosine desc, vec_id asc) as rank
              from s
            )
            select probe_id, vec_id, cosine, rank from r where rank <= 5
        """,
    }
