"""Regression guard for the round-3 oracle-backed contract queries.

The driver's CORRECTNESS harness compares every ``__spark_entry__``
query against its DuckDB oracle at sf0.01.  Round 3 converted the four
formerly rows-only entries (minhash_lsh_pairs / minhash_lsh_assignments /
exact_substring_pairs / ann_lsh_recall) into fully hash-checked ones;
this test pins exactly those four with the driver's own comparison
semantics (columns sorted by name, floats rounded to 6 dp, rows sorted)
so a kernel / LSH / chunking change that would break the contract fails
here first.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.01"

NEW_ORACLE_QUERIES = [
    "minhash_lsh_pairs",
    "minhash_lsh_assignments",
    "exact_substring_pairs",
    "ann_lsh_recall",
    # round 5: kernel queries promoted from tests-only to oracle-checked
    "token_set_pairs",
    "acronym_pairs",
    # round 5: Gopher-style repetition signals + portable SimHash block join
    "repetition_signals",
    "simhash_hamming_pairs",
    # round 5: deterministic-pivot IVF ANN (algorithm-replicating oracle)
    "ann_ivf_topk",
    # round 5: composite Gopher-rules keep/drop verdict
    "gopher_filter",
    # round 5: winnowing local fingerprints, corpus-unigram NLL quality,
    # deterministic splits, and the cluster-size-histogram dedup report
    "winnow_fingerprints",
    "unigram_nll",
    "deterministic_split",
    "cluster_size_histogram",
    "ngram_decontaminate",
    "stratified_cap",
    "tfidf_top_terms",
]


def _canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from '{p}'")
    return con


@pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"),
    reason="driver test data not present",
)
@pytest.mark.parametrize("name", NEW_ORACLE_QUERIES)
def test_oracle_query_matches_duckdb(spark, oracle_con, name):
    sdf = _canon(entry.queries()[name](spark, SF_DIR).toPandas())
    odf = _canon(oracle_con.execute(entry.oracle_sql()[name]).df())
    assert list(sdf.columns) == list(odf.columns)
    assert len(sdf) == len(odf) and len(sdf) > 0
    assert sdf.astype(str).equals(odf.astype(str))


SF01_DIR = "/root/testdata/sf0.1"


@pytest.mark.skipif(
    not os.path.exists(f"{SF01_DIR}/lineitem.parquet"),
    reason="sf0.1 test data not present",
)
def test_oracle_query_matches_duckdb_at_sf01(spark):
    """Round-5 verdict item 7: one contract query exercised at 10x the
    driver's oracle scale (sf0.1, ~600k lineitem rows) so scale-dependent
    planning regressions surface in the test loop, not only in bench."""
    con = duckdb.connect()
    con.execute(
        f"create view lineitem as select * from '{SF01_DIR}/lineitem.parquet'"
    )
    sdf = _canon(
        entry.queries()["pair_canonicalization"](spark, SF01_DIR).toPandas()
    )
    odf = _canon(con.execute(entry.oracle_sql()["pair_canonicalization"]).df())
    assert list(sdf.columns) == list(odf.columns)
    assert len(sdf) == len(odf) and len(sdf) > 50_000
    assert sdf.astype(str).equals(odf.astype(str))


def test_oracle_cfg_disables_hamming_only(spark):
    """The oracle config must keep SimHash CANDIDATE generation (extra
    recall for the Jaccard channel) while never ACCEPTING on distance —
    the property the SQL oracle's equality depends on."""
    assert entry._ORACLE_CFG.hamming_threshold == -1
    assert entry._ORACLE_CFG.jaccard_threshold == entry.DEFAULT_CONFIG.jaccard_threshold
    assert entry._ORACLE_CFG.simhash_blocks == entry.DEFAULT_CONFIG.simhash_blocks
