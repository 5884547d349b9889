"""Property tests of the host FM-index against a brute-force substring oracle.

This is the test strategy SURVEY.md section 4 prescribes (the reference has no
test suite): counts, ranges, distinct-counts and extraction on random token
corpora must match a naive oracle exactly.
"""

import numpy as np
import pytest

from seal_tpu.index import FMIndex, SHIFT
from seal_tpu.index.suffix_array import (
    brute_force_suffix_array,
    build_suffix_array,
    suffix_array_doubling,
)


def random_docs(rng, n_docs=20, max_len=60, vocab=12):
    return [
        rng.integers(0, vocab, size=rng.integers(1, max_len)).tolist()
        for _ in range(n_docs)
    ]


def oracle_concat(docs):
    """The concatenated reversed corpus the index is defined over."""
    out = []
    for d in docs:
        out.extend(list(reversed(d)))
    return out


def count_occurrences(haystack, needle):
    n, m = len(haystack), len(needle)
    if m == 0:
        return n + 1
    return sum(1 for i in range(n - m + 1) if haystack[i : i + m] == needle)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_suffix_array_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    text = rng.integers(1, 8, size=rng.integers(2, 200))
    text = np.concatenate([text, [0]]).astype(np.int32)
    expect = brute_force_suffix_array(text)
    np.testing.assert_array_equal(suffix_array_doubling(text), expect)
    np.testing.assert_array_equal(build_suffix_array(text), expect)


def test_suffix_array_rejects_bad_sentinel():
    with pytest.raises(ValueError):
        build_suffix_array(np.array([3, 1, 2], dtype=np.int32))
    with pytest.raises(ValueError):
        build_suffix_array(np.array([3, 0, 2, 0], dtype=np.int32))


def test_counts_match_oracle(rng):
    docs = random_docs(rng)
    index = FMIndex()
    index.initialize(docs)
    corpus = oracle_concat(docs)

    # every true substring of every doc must be found with the right count
    for doc in docs[:8]:
        for i in range(len(doc)):
            for j in range(i + 1, min(len(doc), i + 5) + 1):
                pat = doc[i:j]
                expect = count_occurrences(corpus, list(reversed(pat)))
                assert index.get_count(pat) == expect, pat

    # random patterns (mostly absent)
    for _ in range(200):
        pat = rng.integers(0, 14, size=rng.integers(1, 4)).tolist()
        expect = count_occurrences(corpus, list(reversed(pat)))
        assert index.get_count(pat) == expect, pat

    # out-of-alphabet tokens
    assert index.get_count([10**6]) == 0
    assert index.get_count([docs[0][0], 10**6]) == 0


def test_get_doc_roundtrip(rng):
    docs = random_docs(rng)
    index = FMIndex()
    index.initialize(docs, labels=[f"doc{i}" for i in range(len(docs))])
    assert index.n_docs == len(docs)
    assert len(index) == sum(len(d) for d in docs)
    for i, doc in enumerate(docs):
        assert index.get_doc(i) == doc
        assert index.get_doc_length(i) == len(doc)
    # doc index from token position
    pos = 0
    for i, doc in enumerate(docs):
        assert index.get_doc_index(pos) == i
        assert index.get_doc_index(pos + len(doc) - 1) == i
        pos += len(doc)


def test_locate_and_doc_indices(rng):
    docs = random_docs(rng, n_docs=8, max_len=30, vocab=6)
    index = FMIndex()
    index.initialize(docs)
    corpus = oracle_concat(docs)
    for _ in range(50):
        pat = rng.integers(0, 6, size=rng.integers(1, 3)).tolist()
        rev = list(reversed(pat))
        low, high = index.get_range(pat)
        got_positions = sorted(index.locate(r) for r in range(low, high))
        expect_positions = sorted(
            i for i in range(len(corpus) - len(rev) + 1) if corpus[i : i + len(rev)] == rev
        )
        assert got_positions == expect_positions, pat


def test_continuations_match_oracle(rng):
    docs = random_docs(rng, n_docs=10, max_len=40, vocab=8)
    index = FMIndex()
    index.initialize(docs)
    corpus = oracle_concat(docs)
    n = len(corpus)
    for _ in range(60):
        pat = rng.integers(0, 8, size=rng.integers(1, 3)).tolist()
        rev = list(reversed(pat))
        # a continuation of `pat` appears at BWT position = symbol preceding
        # each occurrence of rev(pat) in the reversed corpus
        expect = set()
        for i in range(n - len(rev) + 1):
            if corpus[i : i + len(rev)] == rev:
                if i > 0:
                    expect.add(corpus[i - 1])
        got = set(index.get_continuations(pat))
        # the sentinel-adjacent continuation (occurrence at position 0) is
        # excluded by get_distinct's <= 0 filter, matching the reference
        assert got == expect, pat


def test_distinct_count_matches_oracle(rng):
    docs = random_docs(rng, n_docs=10, max_len=40, vocab=8)
    index = FMIndex()
    index.initialize(docs)
    for _ in range(40):
        pat = rng.integers(0, 8, size=rng.integers(1, 3)).tolist()
        low, high = index.get_range(pat)
        distinct, counts = index.get_distinct_count(low, high)
        assert len(distinct) == len(counts)
        # each reported continuation's count equals the count of pat+[c]
        for c, cnt in zip(distinct, counts):
            assert index.get_count(list(pat) + [c]) == cnt
        # total (incl. sentinel / dropped symbols) equals range size
        full = index.distinct_count(low, high)
        assert sum(full[1::2]) == high - low

    multi = index.get_distinct_count_multi([0, 0], [0, index.size()])
    assert multi[0] == ([], [])
    assert multi[1][0] == index.occurring_distinct


def test_occurring_counts(rng):
    docs = random_docs(rng)
    index = FMIndex()
    index.initialize(docs)
    flat = [t for d in docs for t in d]
    for tok, cnt in zip(index.occurring_distinct, index.occurring_counts):
        assert flat.count(tok) == cnt
    assert set(index.occurring_distinct) == set(flat)
    assert sorted(index.occurring) == sorted(set(flat))


def test_save_load_roundtrip(tmp_path, rng):
    docs = random_docs(rng, n_docs=5)
    index = FMIndex()
    index.initialize(docs, labels=[f"d{i}" for i in range(5)])
    path = str(tmp_path / "idx")
    index.save(path)
    loaded = FMIndex.load(path)
    assert loaded.labels == index.labels
    assert loaded.beginnings == index.beginnings
    np.testing.assert_array_equal(loaded.text, index.text)
    np.testing.assert_array_equal(loaded.psi, index.psi)
    assert loaded.occurring_distinct == index.occurring_distinct
    for i in range(5):
        assert loaded.get_doc(i) == docs[i]


def test_extract_text_order(rng):
    """extract_text returns text[end-1], ..., text[begin] like the reference
    BWT walk (fm_index.cpp:169-184)."""
    docs = [[5, 6, 7, 8]]
    index = FMIndex()
    index.initialize(docs)
    # text = reversed doc + sentinel = [8,7,6,5,0] shifted by 1
    assert index.extract_text(0, 4) == [5 + SHIFT, 6 + SHIFT, 7 + SHIFT, 8 + SHIFT]
    assert index.get_doc(0) == [5, 6, 7, 8]


def test_initialize_from_arrays_matches_initialize(rng):
    docs = random_docs(rng, n_docs=15)
    a = FMIndex()
    a.initialize(docs, labels=[f"d{i}" for i in range(len(docs))])
    b = FMIndex()
    flat = np.concatenate([np.asarray(d) for d in docs])
    lens = np.array([len(d) for d in docs])
    b.initialize_from_arrays(flat, lens, labels=[f"d{i}" for i in range(len(docs))])
    np.testing.assert_array_equal(a.text, b.text)
    assert a.beginnings == b.beginnings
    assert sorted(a.occurring) == sorted(b.occurring)
    assert a.labels == b.labels
    for i in range(len(docs)):
        assert b.get_doc(i) == docs[i]


def test_initialize_from_arrays_validation():
    idx = FMIndex()
    with pytest.raises(ValueError):
        idx.initialize_from_arrays(np.array([1, 2]), np.array([1, 0, 1]))
    with pytest.raises(ValueError):
        idx.initialize_from_arrays(np.array([1, 2, 3]), np.array([2]))
