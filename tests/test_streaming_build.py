"""Streaming index build (reference ``initialize_from_file`` parity,
``/root/reference/seal/cpp_modules/fm_index.cpp:43-48`` +
``seal/index.py:57-65``): the cache-file flow must produce an index
identical to the in-memory build."""

import os
import tempfile

import numpy as np

from seal_tpu.index import FMIndex
from seal_tpu.index.fm_index import SHIFT


def _random_docs(rng, n=30, vocab=50):
    return [
        rng.integers(0, vocab, size=rng.integers(1, 40)).tolist() for _ in range(n)
    ]


def test_streaming_build_equals_in_memory():
    rng = np.random.default_rng(5)
    docs = _random_docs(rng)
    a = FMIndex()
    a.initialize(docs, in_memory=True, labels=[f"d{i}" for i in range(len(docs))])
    b = FMIndex()
    b.initialize(
        (d for d in docs),  # generator: no list is ever materialized
        in_memory=False,
        labels=[f"d{i}" for i in range(len(docs))],
    )
    np.testing.assert_array_equal(a.text, b.text)
    np.testing.assert_array_equal(a.sa, b.sa)
    np.testing.assert_array_equal(a.psi, b.psi)
    np.testing.assert_array_equal(a.C, b.C)
    assert a.beginnings == b.beginnings
    assert sorted(a.occurring) == sorted(b.occurring)
    assert a.occurring_distinct == b.occurring_distinct
    assert a.labels == b.labels
    # behavioral spot-checks
    for _ in range(20):
        d = docs[int(rng.integers(len(docs)))]
        i = int(rng.integers(0, len(d)))
        ng = d[i : i + 3]
        assert a.get_count(ng) == b.get_count(ng)
    assert b.get_doc(3) == docs[3]


def test_initialize_from_file_packed_format():
    rng = np.random.default_rng(6)
    docs = _random_docs(rng, n=5)
    # write the packed format by hand: shifted, per-doc reversed, '<i4'
    fd, path = tempfile.mkstemp()
    with os.fdopen(fd, "wb") as f:
        for d in docs:
            f.write((np.asarray(d[::-1], np.int64) + SHIFT).astype("<i4").tobytes())
    try:
        idx = FMIndex()
        idx.initialize_from_file(path)
    finally:
        os.unlink(path)
    ref = FMIndex()
    ref.initialize(docs)
    np.testing.assert_array_equal(idx.text, ref.text)
    np.testing.assert_array_equal(idx.psi, ref.psi)
    # no per-doc boundaries were provided: the file is one document
    assert idx.beginnings == [0, sum(len(d) for d in docs)]
    for d in docs:
        assert idx.get_count(d[:3]) == ref.get_count(d[:3])
