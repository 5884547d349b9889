"""Wavelet-tree compact index: parity with the host oracle and the Psi
layout, including a full constrained decode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seal_tpu.index import FMIndex
from seal_tpu.index.device_index import DeviceFMIndex
from seal_tpu.index.wavelet import WaveletFMIndex
from seal_tpu.ops import fm_ops, wt_ops


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    docs = [
        rng.integers(0, 37, size=rng.integers(2, 60)).tolist() for _ in range(40)
    ]
    host = FMIndex()
    host.initialize(docs)
    wt = WaveletFMIndex.from_host(host, vocab=40)
    dev = DeviceFMIndex.from_host(host, vocab=40)
    return host, wt, dev, docs, rng


@pytest.fixture(scope="module")
def hybrid(setup):
    host, _, _, _, _ = setup
    return WaveletFMIndex.from_host(host, vocab=40, keep_bwt=True)


def test_hybrid_bwt_direct_gather_matches_descent(setup, hybrid):
    host, wt, dev, docs, rng = setup
    rows = rng.integers(0, host.size(), size=200).astype(np.int32)
    direct = np.asarray(jax.jit(lambda r: wt_ops.bwt_at(hybrid, r))(rows))
    descent = np.asarray(jax.jit(lambda r: wt_ops.bwt_at(wt, r))(rows))
    np.testing.assert_array_equal(direct, descent)


def test_hybrid_window_matches_psi(setup, hybrid):
    host, wt, dev, docs, rng = setup
    n = host.size()
    lo = rng.integers(0, n - 1, size=(4, 3)).astype(np.int32)
    hi = np.minimum(lo + rng.integers(1, n, size=(4, 3)), n).astype(np.int32)
    htok, hval = jax.jit(
        lambda a, b: wt_ops.window_continuations(hybrid, a, b, 8)
    )(lo, hi)
    ptok, pval = jax.jit(lambda a, b: fm_ops.window_continuations(dev, a, b, 8))(lo, hi)
    np.testing.assert_array_equal(np.asarray(htok), np.asarray(ptok))
    np.testing.assert_array_equal(np.asarray(hval), np.asarray(pval))


def test_hybrid_full_decode_matches_psi_layout(setup, hybrid):
    host, wt, dev, docs, rng = setup
    from seal_tpu.decoding.generate import fm_index_generate, pad_batch
    from seal_tpu.models import bart
    from seal_tpu.models.config import bart_tiny

    cfg = bart_tiny(vocab_size=40)
    params = bart.init_params(jax.random.PRNGKey(0), cfg)
    queries = [[0] + rng.integers(4, 36, size=4).tolist() + [2] for _ in range(3)]
    ids, mask = pad_batch(queries, cfg.pad_token_id)
    common = dict(
        num_beams=4, max_length=6, min_length=1, forced_bos_token_id=None,
        top_m=8, window=4, exact_chunk=4,
    )
    a = fm_index_generate(cfg, params, hybrid, ids, mask, **common)
    b = fm_index_generate(cfg, params, dev, ids, mask, **common)
    for qa, qb in zip(a, b):
        sa = sorted((round(s, 4), tuple(t)) for s, t in qa)
        sb = sorted((round(s, 4), tuple(t)) for s, t in qb)
        assert sa == sb


def test_rank_matches_host(setup):
    host, wt, dev, docs, rng = setup
    n = host.size()
    symbols = rng.integers(0, host.C.size - 1, size=128).astype(np.int32)
    positions = rng.integers(0, n + 1, size=128).astype(np.int32)
    got = np.asarray(jax.jit(lambda s, p: wt_ops.rank(wt, s, p))(symbols, positions))
    want = [host.occ(int(s), int(p)) for s, p in zip(symbols, positions)]
    np.testing.assert_array_equal(got, want)


def test_access_matches_host_bwt(setup):
    host, wt, dev, docs, rng = setup
    rows = rng.integers(0, host.size(), size=200).astype(np.int32)
    got = np.asarray(jax.jit(lambda r: wt_ops.access(wt, r))(rows))
    np.testing.assert_array_equal(got, host.bwt[rows])


def test_ranges_match_psi_layout(setup):
    host, wt, dev, docs, rng = setup
    seqs = []
    for _ in range(50):
        if rng.random() < 0.7:
            d = docs[int(rng.integers(len(docs)))]
            i = int(rng.integers(0, max(1, len(d) - 3)))
            seqs.append(d[i : i + int(rng.integers(1, 4))])
        else:
            seqs.append(rng.integers(0, 40, size=int(rng.integers(1, 4))).tolist())
    L = max(len(s) for s in seqs)
    toks = np.zeros((len(seqs), L), np.int32)
    lens = np.zeros(len(seqs), np.int32)
    for i, s in enumerate(seqs):
        toks[i, : len(s)] = s
        lens[i] = len(s)
    wlo, whi = jax.jit(lambda t, l: wt_ops.range_for_sequences(wt, t, l))(toks, lens)
    plo, phi = jax.jit(lambda t, l: fm_ops.range_for_sequences(dev, t, l))(toks, lens)
    np.testing.assert_array_equal(np.asarray(wlo), np.asarray(plo))
    np.testing.assert_array_equal(np.asarray(whi), np.asarray(phi))


def test_window_and_bucket_counts_match(setup):
    host, wt, dev, docs, rng = setup
    n = host.size()
    lo = rng.integers(0, n - 1, size=(4, 3)).astype(np.int32)
    hi = np.minimum(lo + rng.integers(1, n, size=(4, 3)), n).astype(np.int32)

    wtok, wval = jax.jit(lambda a, b: wt_ops.window_continuations(wt, a, b, 8))(lo, hi)
    ptok, pval = jax.jit(lambda a, b: fm_ops.window_continuations(dev, a, b, 8))(lo, hi)
    np.testing.assert_array_equal(np.asarray(wtok), np.asarray(ptok))
    np.testing.assert_array_equal(np.asarray(wval), np.asarray(pval))

    bc = np.asarray(jax.jit(lambda a, b: wt_ops.bucket_counts(wt, a, b))(lo, hi))
    bsz = wt_ops.bucket_size_of(wt)
    # oracle: histogram of shifted BWT symbols by bucket
    for i in range(4):
        for j in range(3):
            seg = host.bwt[int(lo[i, j]) : int(hi[i, j])]
            want = np.bincount(seg // bsz, minlength=bc.shape[-1])
            np.testing.assert_array_equal(bc[i, j], want[: bc.shape[-1]])
    # totals must cover the interval exactly
    np.testing.assert_array_equal(bc.sum(-1), hi - lo)


def test_full_decode_matches_psi_layout(setup):
    host, wt, dev, docs, rng = setup
    from seal_tpu.decoding.generate import fm_index_generate, pad_batch
    from seal_tpu.models import bart
    from seal_tpu.models.config import bart_tiny

    cfg = bart_tiny(vocab_size=40)
    params = bart.init_params(jax.random.PRNGKey(0), cfg)
    queries = [[0] + rng.integers(4, 36, size=4).tolist() + [2] for _ in range(3)]
    ids, mask = pad_batch(queries, cfg.pad_token_id)
    common = dict(
        num_beams=4, max_length=6, min_length=1, forced_bos_token_id=None,
        top_m=8, window=4, exact_chunk=4,
    )
    a = fm_index_generate(cfg, params, wt, ids, mask, **common)
    b = fm_index_generate(cfg, params, dev, ids, mask, **common)
    for qa, qb in zip(a, b):
        sa = sorted((round(s, 4), tuple(t)) for s, t in qa)
        sb = sorted((round(s, 4), tuple(t)) for s, t in qb)
        assert sa == sb


def test_memory_footprint_compact():
    rng = np.random.default_rng(0)
    docs = [rng.integers(4, 50000, size=120).tolist() + [2] for _ in range(500)]
    host = FMIndex()
    host.initialize(docs)
    wt = WaveletFMIndex.from_host(host, vocab=50265)
    dev = DeviceFMIndex.from_host(host, vocab=50265)
    per_tok_wt = wt.memory_bytes() / len(host)
    per_tok_dev = dev.memory_bytes() / len(host)
    # fixed node tables dominate at this tiny scale; subtract them for the
    # asymptotic per-token figure
    fixed = (
        wt.node_start.size * 4 + wt.node_cnt.size * 4
        + wt.C.size * 4 + wt.corpus_counts.size * 4
    )
    marginal = (wt.memory_bytes() - fixed) / len(host)
    assert marginal < 4.0, (marginal, per_tok_wt)
    assert marginal < per_tok_dev
