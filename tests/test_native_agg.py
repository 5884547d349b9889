"""Native aggregation kernels vs pure-Python semantics."""

import numpy as np
import pytest

from seal_tpu.cpp import native


@pytest.fixture(scope="module")
def lib():
    return native.load()


def test_stage1_claim_sequential_semantics(lib):
    covered = np.zeros(20, np.uint8)
    # rows claiming overlapping spans, in order
    ends = np.array([5, 5, 7, 12], np.int64)  # spans [2,5) [2,5) [4,7) [9,12)
    flags = lib.stage1_claim(covered, ends, 3)
    assert flags.tolist() == [True, False, False, True]
    assert covered[2:5].all() and covered[9:12].all()
    assert not covered[5:9].any()
    # clamping at 0
    covered2 = np.zeros(10, np.uint8)
    flags2 = lib.stage1_claim(covered2, np.array([2], np.int64), 5)
    assert flags2.tolist() == [True]
    assert covered2[0:2].all()


def _brute_matches(patterns, docs):
    out = set()
    for d, doc in enumerate(docs):
        for p, pat in enumerate(patterns):
            L = len(pat)
            for s in range(len(doc) - L + 1):
                if doc[s : s + L] == list(pat):
                    out.add((d, p, s))
    return out


@pytest.mark.parametrize("seed", range(4))
def test_ac_match_matches_bruteforce(lib, seed):
    rng = np.random.default_rng(seed)
    docs = [rng.integers(0, 6, size=rng.integers(5, 40)).tolist() for _ in range(12)]
    patterns = []
    for _ in range(15):
        if rng.random() < 0.6:  # real substring
            d = docs[rng.integers(0, len(docs))]
            i = rng.integers(0, len(d))
            patterns.append(tuple(d[i : i + rng.integers(1, 4)]))
        else:
            patterns.append(tuple(rng.integers(0, 7, size=rng.integers(1, 3)).tolist()))
    patterns = [p for p in patterns if p]
    triples = lib.ac_match([list(p) for p in patterns], docs)
    got = {(int(a), int(b), int(c)) for a, b, c in triples}
    assert got == _brute_matches(patterns, docs)


def test_ac_match_overlapping_patterns(lib):
    # nested + overlapping patterns must all be reported
    docs = [[1, 2, 3, 2, 3, 4]]
    patterns = [[2, 3], [1, 2, 3], [3, 2], [2, 3, 4], [3]]
    triples = lib.ac_match(patterns, docs)
    got = {(int(a), int(b), int(c)) for a, b, c in triples}
    assert got == _brute_matches([tuple(p) for p in patterns], docs)


def test_ac_match_capacity_growth(lib):
    # force > initial capacity matches
    docs = [[1] * 500] * 10
    patterns = [[1], [1, 1]]
    triples = lib.ac_match(patterns, docs)
    assert len(triples) == 10 * (500 + 499)
