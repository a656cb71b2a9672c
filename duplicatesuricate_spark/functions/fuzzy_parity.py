"""Exact fuzzywuzzy-parity kernels (A8/A9 closure, round-1 verdict item 5).

The default ``fuzzy``/``token`` kernels in :mod:`kernels` are Column-
expression approximations (normalized Levenshtein / token-Jaccard) — the
right scale default, but a reference user migrating a TUNED threshold gets
different scores.  This module reimplements the reference's actual
semantics bit-for-bit:

  * ``fuzzyscore`` (reference duplicatesuricate/utils.py:99-113) is
    fuzzywuzzy ``fuzz.ratio`` rescaled by x/50-1: pure-Python fuzzywuzzy is
    ``int(round(100 * difflib.SequenceMatcher(None, s1, s2).ratio()))``
    with None->0, equal->100, empty->0 short-circuits;
  * ``tokenscore`` (utils.py:187-201) is fuzzywuzzy ``token_set_ratio``:
    full_process (ascii-strip chars 128-255, \\W -> space, lower, strip),
    token-set decomposition into sorted intersection / differences, and the
    max of three pairwise ``ratio`` calls over the recombined strings.

fuzzywuzzy itself is not importable here; the reimplementation is pinned by
literal values from the fuzzywuzzy README/test-suite in
tests/test_fuzzy_parity.py.  Both kernels ship as Arrow-batched pandas
UDFs — inherently per-row string algorithms (quadratic SequenceMatcher),
so they are the OPT-IN slow path: use them for reference-threshold
migration on scored candidate pairs (millions of rows), never as the
corpus-scale candidate generator (that is the sketch pipeline's job).
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

# fuzzywuzzy utils.asciidammit on py3 deletes chars 128-255 via a
# translation table (codepoints >= 256 pass through — parity, not a bug fix)
_ASCII_STRIP = {i: None for i in range(128, 256)}
_NON_ALNUM = re.compile(r"(?u)\W")


def fw_ratio_py(s1: str | None, s2: str | None) -> int:
    """fuzzywuzzy ``fuzz.ratio`` parity (pure-python mode)."""
    if s1 is None or s2 is None:
        return 0
    if s1 == s2:
        return 100
    if len(s1) == 0 or len(s2) == 0:
        return 0
    # fuzzywuzzy uses py3 round (half-even) via utils.intr
    return int(round(100 * SequenceMatcher(None, s1, s2).ratio()))


def fw_full_process_py(s: str | None) -> str:
    """fuzzywuzzy ``utils.full_process(s, force_ascii=True)`` parity."""
    if s is None:
        return ""
    s = str(s).translate(_ASCII_STRIP)
    return _NON_ALNUM.sub(" ", s).lower().strip()


def fw_token_set_ratio_py(s1: str | None, s2: str | None) -> int:
    """fuzzywuzzy ``fuzz.token_set_ratio`` parity (full_process=True)."""
    if s1 is None or s2 is None:
        return 0
    p1, p2 = fw_full_process_py(s1), fw_full_process_py(s2)
    if not p1 or not p2:
        return 0
    t1, t2 = set(p1.split()), set(p2.split())
    sorted_sect = " ".join(sorted(t1 & t2))
    sorted_1to2 = " ".join(sorted(t1 - t2))
    sorted_2to1 = " ".join(sorted(t2 - t1))
    combined_1to2 = (sorted_sect + " " + sorted_1to2).strip()
    combined_2to1 = (sorted_sect + " " + sorted_2to1).strip()
    sorted_sect = sorted_sect.strip()
    return max(
        fw_ratio_py(sorted_sect, combined_1to2),
        fw_ratio_py(sorted_sect, combined_2to1),
        fw_ratio_py(combined_1to2, combined_2to1),
    )


def _score_series(a: pd.Series, b: pd.Series, fn) -> pd.Series:
    # reference null rule (utils.py:109-110, 197-198): null operand -> 0.0
    # SCORE (not ratio 0 -> -1.0)
    out = [
        0.0 if (pd.isna(x) or pd.isna(y)) else fn(x, y) / 50.0 - 1.0
        for x, y in zip(a, b)
    ]
    return pd.Series(out, dtype="float64")


# DoubleType() (not a DDL string) so the UDFs construct without an active
# SparkSession — the module stays importable driver- and test-side
@pandas_udf(DoubleType())
def fuzzy_exact_score(a: pd.Series, b: pd.Series) -> pd.Series:
    """Reference ``fuzzyscore`` with exact fuzzywuzzy.ratio parity."""
    return _score_series(a, b, fw_ratio_py)


@pandas_udf(DoubleType())
def token_set_exact_score(a: pd.Series, b: pd.Series) -> pd.Series:
    """Reference ``tokenscore`` with exact fuzzywuzzy.token_set_ratio
    parity."""
    return _score_series(a, b, fw_token_set_ratio_py)


def fuzzy_exact(a: Column | str, b: Column | str) -> Column:
    from pyspark.sql import functions as F

    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return fuzzy_exact_score(a, b)


def token_set_exact(a: Column | str, b: Column | str) -> Column:
    from pyspark.sql import functions as F

    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return token_set_exact_score(a, b)
