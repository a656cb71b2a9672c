"""Tests: façade API (Suricate/Clustricate equivalents) + ML classifier."""

import pytest
from pyspark.sql import functions as F

from duplicatesuricate_spark.api import (
    ClustricateSpark,
    SuricateLinkPairs,
    SuricateSpark,
    build_training_table,
)
from duplicatesuricate_spark.operators.classifiers import (
    DummyClassifier,
    SparkRFClassifier,
)
from duplicatesuricate_spark.sources.corpus import with_doc_identity
from duplicatesuricate_spark.sources.synth import synth_corpus


@pytest.fixture(scope="module")
def entities(spark):
    rows = [
        (1, "acme corp", "berlin", "10115"),
        (2, "acme corporation", "berlin", "10115"),
        (3, "other gmbh", "munich", "80331"),
        (4, "acme corp gmbh", "berlin", "10115"),
        (5, "zeta llc", "hamburg", "20095"),
        (6, "zeta llc", "hamburg", "20095"),
    ]
    return spark.createDataFrame(
        rows, "ix long, name string, city string, postalcode string"
    )


SCOREDICT = {"exact": ["postalcode"], "fuzzy": ["name"]}


def test_suricate_start_linkage(entities):
    s = SuricateSpark(
        entities, "ix", SCOREDICT,
        blocking_any=["city"], decision_threshold=0.4,
    )
    got = {(r.id_a, r.id_b): r.y_proba for r in s.start_linkage().collect()}
    assert (5, 6) in got and got[(5, 6)] == 1.0      # identical pair
    assert (1, 2) in got                             # same plz, close name
    assert all(3 not in p for p in got)              # munich blocks alone


def test_suricate_coherency_check(entities):
    with pytest.raises(ValueError):
        SuricateSpark(entities, "ix", {"exact": ["nope"]}, blocking_any=["city"])


def test_training_table_and_rf_classifier(spark, entities):
    y = spark.createDataFrame(
        [(1, 2, 1.0), (5, 6, 1.0), (1, 4, 1.0), (1, 3, 0.0), (2, 3, 0.0)],
        "id_a long, id_b long, y_true double",
    )
    train = build_training_table(entities, y, SCOREDICT, "ix")
    assert set(train.columns) == {
        "id_a", "id_b", "postalcode_exactscore", "name_fuzzyscore", "y_true"
    }
    clf = SparkRFClassifier(
        ["postalcode_exactscore", "name_fuzzyscore"], n_trees=10
    ).fit(train)
    scored = clf.predict_proba(train)
    rows = {(r.id_a, r.id_b): r.y_proba for r in scored.collect()}
    assert rows[(5, 6)] > 0.5 and rows[(1, 3)] < 0.5
    preds = clf.predict(train)
    assert {(r.id_a, r.id_b) for r in preds.collect()} >= {(5, 6), (1, 2)}


def test_dummy_classifier_deterministic(spark, entities):
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long")
    d = DummyClassifier()
    a = {(r.id_a, r.id_b): r.y_proba for r in d.predict_proba(pairs).collect()}
    b = {(r.id_a, r.id_b): r.y_proba for r in d.predict_proba(pairs).collect()}
    assert a == b and all(0 <= v <= 1 for v in a.values())


def test_clustricate_facade(spark):
    pdf, _ = synth_corpus(n_rows=40, seed=9)
    corpus = with_doc_identity(spark.createDataFrame(pdf))
    c = ClustricateSpark(corpus)
    assigns = c.find_duplicates().toPandas()
    assert len(assigns) == 40
    biggest = (
        assigns.groupby("cluster_id").size().sort_values(ascending=False).index[0]
    )
    grp = c.show_group(int(biggest)).toPandas()
    assert len(grp) >= 2
    assert (grp["cluster_id"] == biggest).all()


def test_two_table_linkage(spark, entities):
    queries = entities.where(F.col("ix") <= 2)
    target = entities.where(F.col("ix") > 2)
    lp = SuricateLinkPairs(
        queries, target, "ix", SCOREDICT,
        blocking_keys=["city"], decision_threshold=0.2,
    )
    got = {(r.id_a, r.id_b) for r in lp.start_linkage().collect()}
    assert (1, 4) in got or (2, 4) in got   # berlin block, same plz
