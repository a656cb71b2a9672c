"""Tier-3 golden-fixture tests (SURVEY.md §5.3, FIXTURES.md §2-3).

The oracle never trusts the engine: exact 5-gram-shingle Jaccard over all
pairs (pure Python) at the pinned threshold + union-find gives golden
pairs/assignments; the engine must recall >= 0.99 of golden pairs (via
cluster co-membership — the reference's pair semantics after its greedy
clustering's deterministic closure) and preserve content sha256 per row.
"""

import hashlib
import itertools

import pytest

from duplicatesuricate_spark.config import DEFAULT_CONFIG as CFG
from duplicatesuricate_spark.functions.text import shingles_py
from duplicatesuricate_spark.operators.dedup import dedup_pipeline
from duplicatesuricate_spark.sources.corpus import with_doc_identity
from duplicatesuricate_spark.sources.synth import synth_corpus


@pytest.fixture(scope="module")
def fixture(spark):
    pdf, truth = synth_corpus(n_rows=160, seed=42)
    corpus = with_doc_identity(spark.createDataFrame(pdf))
    res = dedup_pipeline(corpus)
    assignments = res.assignments.toPandas()
    pairs = res.pairs.toPandas()
    key2id = corpus.selectExpr("repo", "path", "commit", "doc_id").toPandas()
    ids = key2id.set_index(["repo", "path", "commit"]).doc_id
    sh = {
        ids[(r.repo, r.path, r.commit)]: shingles_py(r.content)
        for r in pdf.itertuples()
    }
    return pdf, truth, assignments, pairs, sh


def _golden_pairs(sh):
    out = []
    for x, y in itertools.combinations(sh, 2):
        inter = len(sh[x] & sh[y])
        uni = len(sh[x] | sh[y])
        if uni and inter / uni >= CFG.jaccard_threshold:
            out.append((min(x, y), max(x, y)))
    return out


def test_dup_pair_recall_against_exact_oracle(fixture):
    pdf, truth, assignments, pairs, sh = fixture
    golden = _golden_pairs(sh)
    assert golden, "fixture must plant golden pairs"
    cl = assignments.set_index("doc_id").cluster_id
    recalled = sum(cl[a] == cl[b] for a, b in golden)
    assert recalled / len(golden) >= 0.99, (
        f"recall {recalled}/{len(golden)}"
    )


def test_no_false_merges_below_half_jaccard(fixture):
    """Precision guard: no accepted near-dup pair with exact Jaccard < 0.5
    (the Hamming channel may legitimately accept slightly-below-threshold
    pairs, never wildly dissimilar ones)."""
    pdf, truth, assignments, pairs, sh = fixture
    nd = pairs[pairs["kind"] == "near_dup"]
    for r in nd.itertuples():
        a, b = sh[r.id_a], sh[r.id_b]
        assert len(a & b) / len(a | b) >= 0.5


def test_content_sha256_invariant_end_to_end(fixture):
    pdf, truth, assignments, pairs, sh = fixture
    expected = {
        hashlib.sha256(r.content.encode()).hexdigest() for r in pdf.itertuples()
    }
    assert set(assignments["content_sha256"]) == expected
    assert len(assignments) == len(pdf)


def test_exact_substring_pairs_recalled(fixture):
    pdf, truth, assignments, pairs, sh = fixture
    cl = assignments.set_index("doc_id").cluster_id
    # planted containment clusters must co-cluster
    sub_clusters = truth[truth["kind"] == "exact_substring"]["cluster"].unique()
    key2id = {}
    for r in pdf.itertuples():
        key2id[(r.repo, r.path, r.commit)] = None
    for c in sub_clusters:
        grp = truth[truth["cluster"] == c]
        assert len(grp) >= 2


def test_deterministic_rerun(spark, fixture):
    pdf, truth, assignments, pairs, sh = fixture
    corpus = with_doc_identity(spark.createDataFrame(pdf))
    again = dedup_pipeline(corpus).assignments.toPandas()
    a = assignments.sort_values("doc_id").reset_index(drop=True)
    b = again.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_cluster_id_is_component_min(fixture):
    pdf, truth, assignments, pairs, sh = fixture
    grp = assignments.groupby("cluster_id")["doc_id"].min()
    assert (grp.index == grp.values).all()
