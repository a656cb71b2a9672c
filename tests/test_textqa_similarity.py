"""Tier-2 tests: text-analysis + embedding-similarity operators, including
DuckDB value-parity spot checks (the same mechanism the driver's
correctness gate uses)."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from duplicatesuricate_spark.operators.textqa import (
    token_counts,
    quality_scores,
    language_id,
    fingerprints,
    ngram_jaccard_pairs,
)
from duplicatesuricate_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
    embedding_near_dup_pairs,
    hyperplanes,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog and runs to the forest"),
    (2, "the quick brown fox jumps over the lazy dog and runs to the woods"),
    (3, "der schnelle braune fuchs springt und das ist nicht genug der die das"),
    (4, "x"),
    (5, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_token_counts(spark, docs):
    got = {r.doc_id: (r.ws_tokens, r.bpe_tokens) for r in token_counts(docs).collect()}
    assert got[1][0] == 14
    assert got[4] == (1, 1)
    assert got[5] == (0, 0)


def test_quality_scores_bounds(spark, docs):
    rows = quality_scores(docs).collect()
    for r in rows:
        assert 0.0 <= r.quality <= 1.0
        assert 0.0 <= r.stopword_ratio <= 1.0
    by_id = {r.doc_id: r for r in rows}
    assert by_id[1].quality > by_id[4].quality   # real sentence beats "x"
    assert by_id[5].n_tokens == 0


def test_language_id(spark, docs):
    got = {r.doc_id: r.lang_pred for r in language_id(docs).collect()}
    assert got[1] == "en"
    assert got[3] == "de"


def test_fingerprint_matches_duckdb(spark, docs):
    spark_fp = {r.doc_id: r.fingerprint for r in fingerprints(docs).collect()}
    con = duckdb.connect()
    con.execute("create table d as select * from (values " +
                ",".join(f"({i}, '{t}')" for i, t in DOCS) + ") t(doc_id, text)")
    sql = """
      with toks as (
        select doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
                           x -> x <> '') as tk
        from d
      ), grams as (
        -- NB coalesce: duckdb array_to_string([]) is NULL, spark concat_ws is ''
        select doc_id,
               case when len(tk) >= 5
                    then [md5(array_to_string(tk[i:i+4], ' '))
                          for i in range(1, len(tk) - 3)]
                    else [md5(coalesce(array_to_string(tk, ' '), ''))] end as gs
        from toks
      )
      select doc_id, list_min(gs) as fingerprint from grams
    """
    duck_fp = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    assert spark_fp == duck_fp


def test_ngram_jaccard_pairs(spark, docs):
    got = {(r.id_a, r.id_b): r.jaccard
           for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert (1, 2) in got and got[(1, 2)] > 0.5
    assert all(3 not in p and 4 not in p for p in got)


# ------------------------------------------------------------- similarity


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(11)
    base = rng.normal(size=(20, 8)).astype(np.float32)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    # vector 20 = near-copy of vector 0
    rows.append((20, [float(x) for x in (base[0] + 0.01 * rng.normal(size=8).astype(np.float32))]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk_finds_planted_neighbor(spark, vectors):
    probes = vectors.where(F.col("vec_id") == 0)
    got = brute_force_topk(vectors, probes, k=3, id_col="vec_id").collect()
    assert got[0].vec_id == 20 and got[0].rank == 1 and got[0].cosine > 0.99


def test_brute_force_matches_numpy_oracle(spark, vectors):
    pdf = vectors.toPandas().set_index("vec_id")
    M = np.vstack(pdf["embedding"].map(np.asarray))
    ids = list(pdf.index)
    q = M[ids.index(5)]
    cos = (M @ q) / (np.linalg.norm(M, axis=1) * np.linalg.norm(q))
    order = [ids[i] for i in np.argsort(-cos) if ids[i] != 5][:5]
    probes = vectors.where(F.col("vec_id") == 5)
    got = [r.vec_id for r in
           brute_force_topk(vectors, probes, k=5).orderBy("rank").collect()]
    assert got == order


def test_lsh_topk_is_subset_quality(spark, vectors):
    """LSH with few planes must still return the planted near-copy for its
    own bucket (identical-direction vectors share every sign bit)."""
    probes = vectors.where(F.col("vec_id") == 0)
    got = lsh_topk(vectors, probes, k=3, n_planes=6, dim=8).collect()
    assert any(r.vec_id == 20 for r in got)


def test_embedding_near_dup_pairs(spark, vectors):
    got = {(r.id_a, r.id_b) for r in
           embedding_near_dup_pairs(vectors, threshold=0.99, n_planes=6, dim=8).collect()}
    assert (0, 20) in got
    assert len(got) <= 3


# --------------------------------------------- round 5: repetition + simhash


def test_repetition_signals_known_values(spark):
    from duplicatesuricate_spark.operators.textqa import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "a a a b"),          # 4 toks, 2 uniq, top=3; grams distinct
            (2, "x y x y x y"),      # grams: xyx yxy xyx yxy -> dup 0.5
            (3, ""),                 # empty -> zeros
            (4, "one two"),          # shorter than k -> dup 0.0
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_signals(df, k=3).collect()}
    assert got[1].n_tokens == 4
    assert got[1].unique_token_ratio == 0.5
    assert got[1].top_token_frac == 0.75
    assert got[1].dup_gram_frac == 0.0
    assert got[2].dup_gram_frac == 0.5
    assert got[3].n_tokens == 0
    assert got[3].unique_token_ratio == 0.0
    assert got[3].top_token_frac == 0.0
    assert got[3].dup_gram_frac == 0.0
    assert got[4].dup_gram_frac == 0.0


def test_portable_simhash_exact_dup_and_pigeonhole(spark):
    from duplicatesuricate_spark.operators.lsh import portable_simhash_pairs

    base = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base),                      # exact dup -> hamming 0
            (3, base + " tail drift word"), # near dup
            (4, "completely different content about spark shuffles and joins"),
        ],
        "doc_id long, text string",
    )
    rows = {(r.id_a, r.id_b): r.hamming
            for r in portable_simhash_pairs(df, hamming_threshold=3).collect()}
    assert rows[(1, 2)] == 0
    assert all(h <= 3 for h in rows.values())
    # pigeonhole bound is enforced, not silently under-recalled
    import pytest as _pytest

    with _pytest.raises(ValueError):
        portable_simhash_pairs(df, n_blocks=4, hamming_threshold=4)


def test_portable_simhash_exhaustive_recall(spark):
    """Block-join recall vs the exhaustive O(n^2) hamming join on the same
    signatures: the pigeonhole guarantee means EXACT recall for hamming <=
    n_blocks - 1, so the pair sets must be identical, not just similar."""
    import os

    from duplicatesuricate_spark.operators.lsh import (
        portable_simhash,
        portable_simhash_pairs,
    )

    path = "/root/testdata/sf0.001/documents.parquet"
    if not os.path.exists(path):
        import pytest as _pytest

        _pytest.skip("driver test data not present")
    docs = spark.read.parquet(path)
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in portable_simhash_pairs(docs, hamming_threshold=3).collect()
    }
    sh = portable_simhash(docs).toPandas()
    sigs = dict(zip(sh["doc_id"], sh["simhash"]))
    ids = sorted(sigs)
    want = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    assert got == want and len(want) > 0


# --------------------------------------------------------- round 5: IVF ANN


def test_ivf_full_probe_equals_brute_force(spark, vectors):
    """With n_probe == n_centroids every cell is scanned, so the IVF result
    must EQUAL brute force — the exactness anchor for the approximate path."""
    from duplicatesuricate_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    probes = vectors.where("vec_id < 2")
    full = {tuple(r) for r in
            ivf_topk(vectors, probes, k=4, n_centroids=4, n_probe=4).collect()}
    bf = {tuple(r) for r in brute_force_topk(vectors, probes, k=4).collect()}
    assert full == bf and len(bf) > 0


def test_ivf_centroids_deterministic(spark, vectors):
    from duplicatesuricate_spark.operators.similarity import ivf_centroids

    a = ivf_centroids(vectors, n_centroids=4)
    b = ivf_centroids(vectors, n_centroids=4)
    assert a == b and len(a) == 4
    # pivots are corpus members carrying their own vectors
    ids = {r.vec_id for r in vectors.select("vec_id").collect()}
    assert all(cid in ids and len(cv) > 0 for cid, cv in a)


def test_ivf_partial_probe_is_subset_ranked(spark, vectors):
    """n_probe < n_centroids scans a candidate subset: every returned row's
    cosine must match brute force for that (probe, vec) pair, and ranks are
    contiguous from 1 (a proper top-k over the scanned cells)."""
    from duplicatesuricate_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    probes = vectors.where("vec_id < 2")
    got = ivf_topk(vectors, probes, k=3, n_centroids=4, n_probe=2).collect()
    bf = {(r.probe_id, r.vec_id): r.cosine
          for r in brute_force_topk(vectors, probes, k=10**6).collect()}
    assert len(got) > 0
    by_probe: dict = {}
    for r in got:
        assert bf[(r.probe_id, r.vec_id)] == r.cosine
        by_probe.setdefault(r.probe_id, []).append(r.rank)
    for ranks in by_probe.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


# ----------------------------------------------------- round 5: gopher filter


def test_gopher_filter_flags_and_keep(spark):
    from duplicatesuricate_spark.operators.textqa import gopher_filter

    good = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away to find some other interesting place to sleep")
    df = spark.createDataFrame(
        [
            (1, good),                          # passes everything
            (2, "word " * 200),                 # one token repeated -> fails
            (3, "hi"),                          # too short
            (4, "1 2 3 4 5 6 7 8 9 10 11 12"),  # digits: alpha_ratio ~ 0
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in gopher_filter(df).collect()}
    assert got[1].keep
    assert not got[2].keep and not got[2].flag_unique
    assert not got[3].keep and not got[3].flag_len
    assert not got[4].keep and not got[4].flag_alpha
    # keep is exactly the conjunction of the six flags
    for r in got.values():
        assert r.keep == (r.flag_len and r.flag_word_len and r.flag_alpha
                          and r.flag_top_token and r.flag_unique
                          and r.flag_dup_gram)


# --------------------------------------- round 5: winnowing + unigram NLL


def test_winnow_fingerprints_guarantee(spark):
    """Winnowing's contract: docs sharing a run of >= k + w - 1 tokens
    share at least one fingerprint; fingerprints are distinct per doc."""
    from duplicatesuricate_spark.operators.textqa import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    df = spark.createDataFrame(
        [
            (1, "one two three " + shared + " four five six"),
            (2, "seven eight " + shared + " nine ten"),
            (3, "completely different words with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(df, k=5, w=4).collect()
    by_doc = {}
    for r in fp:
        by_doc.setdefault(r.doc_id, []).append(r.fingerprint)
    for d, fps in by_doc.items():
        assert len(fps) == len(set(fps)), "fingerprints must be distinct"
    assert set(by_doc[1]) & set(by_doc[2]), "shared 8-token run -> shared fp"
    assert not (set(by_doc[3]) & (set(by_doc[1]) | set(by_doc[2])))


def test_winnow_short_doc_falls_back_to_whole_doc(spark):
    from duplicatesuricate_spark.operators.textqa import winnow_fingerprints

    df = spark.createDataFrame([(1, "just three tokens")],
                               "doc_id long, text string")
    fp = winnow_fingerprints(df, k=5, w=4).collect()
    assert len(fp) == 1


def test_unigram_nll_orders_common_vs_rare(spark):
    """A doc of corpus-frequent tokens scores lower NLL than a doc of
    corpus-unique tokens; empty docs drop out (inner semantics)."""
    from duplicatesuricate_spark.operators.textqa import unigram_nll

    df = spark.createDataFrame(
        [
            (1, "the the the the cat"),
            (2, "the cat sat on the mat"),
            (3, "xylophone quixotic zephyr"),
            (4, "   "),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in unigram_nll(df).collect()}
    assert 4 not in rows
    assert rows[1].unigram_nll < rows[3].unigram_nll
    assert rows[1].n_tokens == 5


# ------------------------------------------- round 5: deterministic split


def test_deterministic_split_proportions_and_stability(spark):
    from duplicatesuricate_spark.operators.sampling import (
        deterministic_sample,
        deterministic_split,
    )

    df = spark.range(0, 20_000).withColumnRenamed("id", "doc_id")
    s = deterministic_split(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in
              s.groupBy("split").count().withColumnRenamed("count", "n")
              .collect()}
    assert abs(counts["train"] / 20_000 - 0.8) < 0.02
    assert abs(counts["val"] / 20_000 - 0.1) < 0.01
    assert abs(counts["test"] / 20_000 - 0.1) < 0.01
    # stability: a doc's split is a pure function of its id — growing the
    # corpus or repartitioning never reassigns existing docs
    small = {r.doc_id: r.split
             for r in deterministic_split(
                 spark.range(0, 1_000).withColumnRenamed("id", "doc_id"),
                 {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    big = {r.doc_id: r.split for r in s.repartition(13).collect()}
    assert all(big[i] == small[i] for i in small)
    # sample(f) keeps a subset of sample(f') for f < f' (nested subsets)
    s10 = {r.doc_id for r in deterministic_sample(df, 0.1).collect()}
    s25 = {r.doc_id for r in deterministic_sample(df, 0.25).collect()}
    assert s10 < s25
    assert abs(len(s10) / 20_000 - 0.1) < 0.01


# ------------------------------------ round 5: decontamination + quota cap


def test_ngram_decontaminate_flags_overlap(spark):
    from duplicatesuricate_spark.operators.textqa import ngram_decontaminate

    leak = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    train = spark.createDataFrame(
        [
            (1, "prefix words " + leak + " suffix words"),
            (2, "totally unrelated training document with clean text"),
            (3, leak),  # exact benchmark doc in the training set
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, leak)], "doc_id long, text string")
    got = {r.doc_id: r for r in
           ngram_decontaminate(train, bench, k=8).collect()}
    assert got[1].contaminated and got[1].contaminated_grams > 0
    assert not got[2].contaminated and got[2].contaminated_grams == 0
    assert got[3].contaminated
    assert len(got) == 3, "one verdict row per training doc"


def test_stratified_cap_quota_and_determinism(spark):
    from duplicatesuricate_spark.operators.sampling import stratified_cap

    df = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)],
        "doc_id long, grp string",
    )
    capped = stratified_cap(df, "grp", cap=20, id_col="doc_id")
    counts = {r.grp: r.n for r in capped.groupBy("grp")
              .count().withColumnRenamed("count", "n").collect()}
    assert counts == {"big": 20, "small": 10}
    # survivors are a pure function of (id, salt): repartitioning never
    # changes the selection
    a = sorted(r.doc_id for r in capped.collect())
    b = sorted(r.doc_id for r in
               stratified_cap(df.repartition(7), "grp", 20).collect())
    assert a == b
    # a different salt draws a different (but equally sized) sample
    c = sorted(r.doc_id for r in
               stratified_cap(df, "grp", 20, salt=9).collect())
    assert len(c) == len(a) and c != a


# ----------------------------------------------- round 5: plan-shape checks


def test_round5_operator_plans_are_scale_safe(spark):
    """The new operators must keep the plan shapes their docstrings claim:
    no nested-loop/cartesian joins anywhere; decontamination broadcasts
    the benchmark gram set; split/sample are pure map-side transforms
    (no Exchange at all)."""
    from duplicatesuricate_spark.operators.sampling import (
        deterministic_sample,
        deterministic_split,
        stratified_cap,
    )
    from duplicatesuricate_spark.operators.textqa import (
        gopher_filter,
        ngram_decontaminate,
        unigram_nll,
        winnow_fingerprints,
    )

    docs = spark.createDataFrame(
        [(i, f"token{i} alpha beta gamma delta epsilon zeta {i}")
         for i in range(50)],
        "doc_id long, text string",
    ).withColumn("grp", (F.col("doc_id") % 3).cast("string"))

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    for df in (
        gopher_filter(docs),
        winnow_fingerprints(docs),
        ngram_decontaminate(docs, docs.limit(5)),
        stratified_cap(docs, "grp", 10),
    ):
        p = plan_of(df)
        assert "BroadcastNestedLoopJoin" not in p
        assert "CartesianProductExec" not in p

    # unigram_nll's one sanctioned cross join is the 1-row corpus total,
    # and it must arrive broadcast (never a shuffled cartesian)
    p = plan_of(unigram_nll(docs))
    assert "CartesianProductExec" not in p
    assert "BroadcastExchange" in p or "BroadcastHashJoin" in p

    # decontamination: the bench gram set arrives via broadcast — the
    # train side never shuffles for the join
    p = plan_of(ngram_decontaminate(docs, docs.limit(5)))
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p

    # split/sample: narrow transforms, zero exchanges
    for df in (
        deterministic_split(docs, {"train": 0.9, "test": 0.1}),
        deterministic_sample(docs, 0.5),
    ):
        assert "Exchange" not in plan_of(df)


def test_portable_simhash_pairs_materializes_signatures(spark):
    """The signature table must sit behind a persist boundary: the plan
    references it four times, and without materialization CollapseProject
    inlines the 60-step interpreted majority aggregate into every
    reference — re-evaluated per row per reference (measured >7 min for
    5,000 docs vs ~10 s persisted)."""
    from duplicatesuricate_spark.operators.lsh import portable_simhash_pairs

    df = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon doc{i}") for i in range(8)],
        "doc_id long, text string",
    )
    owned: list = []
    pairs = portable_simhash_pairs(df, cache_registry=owned)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    assert len(owned) == 1
    pairs.count()
    for c in owned:
        c.unpersist()


def test_tfidf_top_terms_ranks_distinctive_first(spark):
    from duplicatesuricate_spark.operators.textqa import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "spark spark spark shared"),
            (2, "duck duck shared common"),
            (3, "common shared words only"),
        ],
        "doc_id long, text string",
    )
    top = tfidf_top_terms(df, top_k=1).collect()
    best = {r.doc_id: r.term for r in top}
    # the corpus-unique high-frequency term wins; 'shared' (df=3, idf=0)
    # never can
    assert best[1] == "spark"
    assert best[2] == "duck"
    assert all(r.tfidf >= 0.0 for r in top)
    ranks = {r.doc_id: r.rank for r in top}
    assert set(ranks.values()) == {1}
