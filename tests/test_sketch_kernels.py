"""Tier-1 kernel tests: pure functions, no Spark session.

Pins the sketch arithmetic (numpy batch kernel == bigint oracle), the
MinHash estimator's statistical contract, and shingle determinism.
"""

import random

import numpy as np
import pandas as pd
import pytest

from duplicatesuricate_spark.config import DedupConfig, DEFAULT_CONFIG
from duplicatesuricate_spark.functions.sketch import (
    _perm_constants,
    _sketch_batch,
    minhash_simhash_py,
)
from duplicatesuricate_spark.functions.text import shingles_py


def _batch(shingle_lists):
    a, b = _perm_constants(DEFAULT_CONFIG)
    return _sketch_batch(
        pd.Series(shingle_lists), a, b, DEFAULT_CONFIG.num_perms
    )


def test_numpy_kernel_matches_bigint_oracle():
    rng = random.Random(7)
    lists = [
        [rng.randint(-(2**63), 2**63 - 1) for _ in range(rng.randint(1, 50))]
        for _ in range(20)
    ] + [[]]
    out = _batch(lists)
    for i, lst in enumerate(lists):
        mh, sh = minhash_simhash_py(lst)
        assert list(out["minhash"].iloc[i]) == mh, f"minhash mismatch row {i}"
        assert int(out["simhash"].iloc[i]) == sh, f"simhash mismatch row {i}"


def test_minhash_estimates_jaccard():
    """|estimate - exact| small on random overlapping sets (128 perms =>
    std <= 0.045; 4 sigma bound with fixed seed)."""
    rng = random.Random(13)
    for _ in range(10):
        universe = [rng.getrandbits(63) for _ in range(400)]
        a = set(rng.sample(universe, 250))
        b = set(rng.sample(universe, 250))
        exact = len(a & b) / len(a | b)
        out = _batch([list(a), list(b)])
        ma, mb = out["minhash"].iloc[0], out["minhash"].iloc[1]
        est = float(np.mean(np.array(ma) == np.array(mb)))
        assert abs(est - exact) < 0.18


def test_identical_sets_estimate_one():
    s = [random.Random(1).getrandbits(63) for _ in range(30)]
    out = _batch([s, list(reversed(s))])
    assert list(out["minhash"].iloc[0]) == list(out["minhash"].iloc[1])
    assert int(out["simhash"].iloc[0]) == int(out["simhash"].iloc[1])


def test_simhash_hamming_tracks_overlap():
    """More shared shingles => smaller Hamming distance (on average)."""
    rng = random.Random(99)
    base = [rng.getrandbits(63) for _ in range(200)]

    def ham_for(replace_n: int) -> float:
        vals = []
        for _ in range(5):
            other = base[:-replace_n] + [rng.getrandbits(63) for _ in range(replace_n)]
            out = _batch([base, other])
            x = int(out["simhash"].iloc[0]) ^ int(out["simhash"].iloc[1])
            vals.append(bin(x & (2**64 - 1)).count("1"))
        return sum(vals) / len(vals)

    assert ham_for(5) < ham_for(100)


def test_shingles_py_deterministic_and_windowed():
    text = "def foo(a, b):\n    return a + b\n"
    s1 = shingles_py(text)
    s2 = shingles_py(text)
    assert s1 == s2
    # k=5 over 8 tokens -> 4 shingles
    toks = ["def", "foo", "a", "b", "return", "a", "b"]  # 'a + b' -> a, b
    assert all(len(t) == 5 for t in s1)
    assert shingles_py("one two") == {("one", "two")}  # short doc: one shingle
    assert shingles_py("") == {()}


def test_config_validation():
    with pytest.raises(ValueError):
        DedupConfig(bands=10, rows_per_band=8)  # 80 != 128
    c = DedupConfig()
    assert c.bands * c.rows_per_band == c.num_perms
