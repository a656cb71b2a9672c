"""Tier-2 tests for the reference-parity linkage operators."""

from pyspark.sql import functions as F

from duplicatesuricate_spark.operators.linkage import (
    blocking_pairs,
    similarity_table,
    threshold_any,
    rule_score,
    decide_matches,
    top_k_matches,
    canonical_pairs,
    pairs_from_clusters,
    majority_vote,
    comparison_view,
)


def _entities(spark):
    rows = [
        (1, "acme corp", "berlin", "10115"),
        (2, "acme corporation", "berlin", "10115"),
        (3, "other gmbh", "munich", "80331"),
        (4, "acme corp", "paris", "75001"),
        (5, None, "berlin", None),
    ]
    return spark.createDataFrame(rows, "ix long, name string, city string, postalcode string")


def test_blocking_all_semantics(spark):
    df = _entities(spark)
    got = {(r.id_a, r.id_b)
           for r in blocking_pairs(df, "ix", all_cols=["city", "postalcode"]).collect()}
    assert got == {(1, 2)}   # only rows sharing BOTH keys; nulls never match


def test_blocking_any_semantics(spark):
    df = _entities(spark)
    got = {(r.id_a, r.id_b)
           for r in blocking_pairs(df, "ix", any_cols=["name", "city"]).collect()}
    # (1,2)+(1,5)+(2,5) share city berlin; (1,4) shares name
    assert got == {(1, 2), (1, 4), (1, 5), (2, 5)}


def test_similarity_table_and_rule_pipeline(spark):
    df = _entities(spark)
    pairs = blocking_pairs(df, "ix", any_cols=["city"])
    scored = similarity_table(
        df, pairs, {"exact": ["postalcode"], "token": ["name"]}, "ix"
    )
    assert set(scored.columns) == {"id_a", "id_b", "postalcode_exactscore", "name_tokenscore"}
    kept = threshold_any(scored, ["postalcode_exactscore", "name_tokenscore"], 0.3)
    ranked = rule_score(kept, ["postalcode_exactscore", "name_tokenscore"])
    # (1,2): exact=1.0, token=2*(1/3)-1=-1/3 -> mean 1/3; null rows -> 0
    matches = decide_matches(ranked, 0.2)
    got = {(r.id_a, r.id_b) for r in matches.collect()}
    assert (1, 2) in got          # same postcode + similar name
    assert (2, 5) not in got      # null name/postcode -> zeros


def test_top_k_matches(spark):
    rows = [(1, 10, 0.9), (1, 11, 0.8), (1, 12, 0.7), (2, 10, 0.6)]
    df = spark.createDataFrame(rows, "id_a long, id_b long, y_proba double")
    got = top_k_matches(df, 2).collect()
    assert sorted((r.id_a, r.id_b) for r in got) == [(1, 10), (1, 11), (2, 10)]


def test_canonical_pairs(spark):
    df = spark.createDataFrame(
        [(2, 1), (1, 2), (3, 3), (4, 5)], "x long, y long"
    )
    got = sorted((r.id_a, r.id_b) for r in canonical_pairs(df, "x", "y").collect())
    assert got == [(1, 2), (4, 5)]


def test_pairs_from_clusters(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 200)], "doc_id long, cluster_id long"
    )
    got = sorted((r.id_a, r.id_b) for r in pairs_from_clusters(df).collect())
    assert got == [(1, 2), (1, 3), (2, 3)]


def test_majority_vote(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (1, "y"), (2, "a"), (2, "b")], "k long, v string"
    )
    got = {r.k: (r.majority, r.votes) for r in majority_vote(df, "k", "v").collect()}
    assert got[1] == ("x", 2)
    assert got[2] == ("a", 1)   # tie -> smallest value


def test_comparison_view(spark):
    df = _entities(spark)
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    row = comparison_view(df, pairs, ["name", "city"], "ix").collect()[0]
    assert row["name_source"] == "acme corp" and row["name_target"] == "acme corporation"
    assert row["city_source"] == row["city_target"] == "berlin"
