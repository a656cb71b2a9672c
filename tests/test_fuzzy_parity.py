"""fuzzywuzzy-parity kernel tests (round-1 verdict item 5).

The pinned literals come from the fuzzywuzzy README / published examples
and hand-verified difflib SequenceMatcher arithmetic (fuzzywuzzy is not
installable in this sandbox), so the reimplementation in
``functions/fuzzy_parity.py`` cannot silently drift from the semantics the
reference depends on (duplicatesuricate/utils.py:99-113, 187-201).
"""

import pytest
from pyspark.sql import functions as F

from duplicatesuricate_spark.functions.fuzzy_parity import (
    fuzzy_exact,
    fw_full_process_py,
    fw_ratio_py,
    fw_token_set_ratio_py,
    token_set_exact,
)
from duplicatesuricate_spark.functions.kernels import similarity_columns

# (a, b, fuzz.ratio(a, b)) — README values + hand-verified SequenceMatcher
PINNED_RATIO = [
    ("this is a test", "this is a test!", 97),          # fuzzywuzzy README
    ("fuzzy wuzzy was a bear", "wuzzy fuzzy was a bear", 91),  # README
    ("NEW YORK METS", "NEW YORK MEATS", 96),             # README
    ("abc", "abc", 100),       # check_for_equivalence
    ("", "", 100),             # equivalence shortcut precedes empty check
    ("abc", "", 0),            # check_empty_string
    (None, "abc", 0),          # check_for_none
]

# (a, b, fuzz.token_set_ratio(a, b))
PINNED_TOKEN_SET = [
    ("fuzzy was a bear", "fuzzy fuzzy was a bear", 100),  # README
    # hand-verified: sect="angels mariners", c12="angels mariners vs",
    # ratio = round(100 * 2*15/33) = 91
    ("mariners vs angels",
     "los angeles angels of anaheim at seattle mariners", 91),
    ("a b c", "c  b    a", 100),   # pure reordering/whitespace
    ("", "x", 0),
    (None, "x", 0),
]


def test_ratio_pinned_values():
    for a, b, want in PINNED_RATIO:
        assert fw_ratio_py(a, b) == want, (a, b)


def test_token_set_ratio_pinned_values():
    for a, b, want in PINNED_TOKEN_SET:
        assert fw_token_set_ratio_py(a, b) == want, (a, b)


def test_full_process_parity():
    # \W -> space (underscore kept), lowercase, strip, chars 128-255 deleted
    assert fw_full_process_py("  Hello, World! x_y ") == "hello  world  x_y"
    assert fw_full_process_py("caf\xe9") == "caf"
    assert fw_full_process_py(None) == ""


def test_symmetry():
    pairs = [(a, b) for a, b, _ in PINNED_RATIO if a and b]
    for a, b in pairs:
        assert fw_ratio_py(a, b) == fw_ratio_py(b, a)
        assert fw_token_set_ratio_py(a, b) == fw_token_set_ratio_py(b, a)


def test_arrow_udfs_match_python(spark):
    rows = [(a, b) for a, b, _ in PINNED_RATIO + PINNED_TOKEN_SET]
    df = spark.createDataFrame(rows, "x string, y string")
    got = df.select(
        fuzzy_exact("x", "y").alias("f"), token_set_exact("x", "y").alias("t")
    ).collect()
    for (a, b), r in zip(rows, got):
        if a is None or b is None:
            assert r["f"] == 0.0 and r["t"] == 0.0   # null -> score 0.0
        else:
            assert r["f"] == pytest.approx(fw_ratio_py(a, b) / 50.0 - 1.0)
            assert r["t"] == pytest.approx(
                fw_token_set_ratio_py(a, b) / 50.0 - 1.0
            )


def test_similarity_columns_exact_kernel_kinds(spark):
    """The opt-in kinds emit the SAME suffixes as their approximate
    counterparts, so tuned reference thresholds carry over."""
    d = spark.createDataFrame(
        [(1, "acme corp ltd"), (2, "ltd corp acme"), (3, "zzz")],
        "id long, name string",
    )
    pairs = (
        d.alias("a")
        .join(d.alias("b"), F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            *similarity_columns({"fuzzy_exact": ["name"], "token_exact": ["name"]}),
        )
    )
    got = {(r.id_a, r.id_b): r for r in pairs.collect()}
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    r12 = got[(1, 2)]
    assert r12["name_tokenscore"] == pytest.approx(1.0)   # reordering -> 100
    assert r12["name_fuzzyscore"] < 1.0                    # plain ratio < 100
