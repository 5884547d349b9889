"""The C++ SA-IS fast path must agree with the NumPy doubling implementation."""

import numpy as np
import pytest

from seal_tpu.cpp import native
from seal_tpu.index.suffix_array import suffix_array_doubling


@pytest.fixture(scope="module")
def lib():
    return native.load()


@pytest.mark.parametrize("seed", range(6))
def test_matches_doubling_random(lib, seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 3000))
    vocab = int(rng.integers(2, 50))
    text = rng.integers(1, vocab, size=n)
    text = np.concatenate([text, [0]]).astype(np.int32)
    np.testing.assert_array_equal(lib.suffix_array(text), suffix_array_doubling(text))


def test_matches_doubling_adversarial(lib):
    cases = [
        [1, 0],
        [1, 1, 1, 1, 0],
        [2, 1, 2, 1, 2, 1, 0],
        [1, 2, 1, 2, 1, 2, 0],
        [3, 3, 2, 2, 1, 1, 0],
        [1, 2, 3, 1, 2, 3, 1, 2, 0],
    ]
    for case in cases:
        text = np.asarray(case, dtype=np.int32)
        np.testing.assert_array_equal(lib.suffix_array(text), suffix_array_doubling(text))


def test_large_random(lib):
    rng = np.random.default_rng(42)
    text = rng.integers(1, 5000, size=500_000)
    text = np.concatenate([text, [0]]).astype(np.int32)
    sa = lib.suffix_array(text)
    # spot-check sortedness on random adjacent pairs
    idx = rng.integers(0, text.size - 1, size=2000)
    for i in idx:
        a, b = sa[i], sa[i + 1]
        m = min(text.size - a, text.size - b, 50)
        ta, tb = text[a : a + m].tolist(), text[b : b + m].tolist()
        assert ta <= tb
    assert np.array_equal(np.sort(sa), np.arange(text.size))
