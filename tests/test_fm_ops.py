"""Device FM-index ops must agree with the host index (which is itself
oracle-tested).  Runs under jit on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seal_tpu.index import FMIndex
from seal_tpu.index.device_index import DeviceFMIndex
from seal_tpu.ops import fm_ops


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    docs = [
        rng.integers(0, 30, size=rng.integers(2, 50)).tolist() for _ in range(25)
    ]
    host = FMIndex()
    host.initialize(docs)
    # keep the optional arrays so locate/text-derived paths are exercised
    dev = DeviceFMIndex.from_host(host, vocab=40, keep_sa=True, keep_text=True)
    return host, dev, docs, rng


def test_rank_matches_host(setup):
    host, dev, docs, rng = setup
    n = host.size()
    symbols = rng.integers(0, host.C.size - 1, size=64).astype(np.int32)
    positions = rng.integers(0, n + 1, size=64).astype(np.int32)
    got = jax.jit(lambda s, p: fm_ops.rank(dev, s, p))(symbols, positions)
    expect = np.array([host.occ(int(s), int(p)) for s, p in zip(symbols, positions)])
    np.testing.assert_array_equal(np.asarray(got), expect)


def test_backward_step_and_ranges(setup):
    host, dev, docs, rng = setup
    pats = [rng.integers(0, 33, size=rng.integers(1, 5)).tolist() for _ in range(40)]
    L = max(len(p) for p in pats)
    toks = np.zeros((len(pats), L), dtype=np.int32)
    lens = np.array([len(p) for p in pats], dtype=np.int32)
    for i, p in enumerate(pats):
        toks[i, : len(p)] = p
    lo, hi = jax.jit(lambda t, l: fm_ops.range_for_sequences(dev, t, l))(toks, lens)
    for i, p in enumerate(pats):
        elo, ehi = host.get_range(p)
        assert (int(lo[i]), int(hi[i])) == (elo, ehi), p
    cnt = jax.jit(lambda t, l: fm_ops.count_sequences(dev, t, l))(toks, lens)
    for i, p in enumerate(pats):
        assert int(cnt[i]) == host.get_count(p), p


def test_window_continuations_exhaustive(setup):
    host, dev, docs, rng = setup
    # pick patterns with small ranges; window must enumerate the exact multiset
    for _ in range(30):
        d = docs[int(rng.integers(0, len(docs)))]
        i = int(rng.integers(0, len(d)))
        pat = d[i : i + 2]
        lo, hi = host.get_range(pat)
        if hi - lo > 16:
            continue
        toks, valid = jax.jit(
            lambda l, h: fm_ops.window_continuations(dev, l, h, 16)
        )(jnp.int32(lo), jnp.int32(hi))
        got = sorted(int(t) for t, v in zip(np.asarray(toks), np.asarray(valid)) if v)
        bwt_slice = [int(x) - 1 for x in host.bwt[lo:hi] if int(x) > 0]
        assert got == sorted(bwt_slice), pat


def test_validate_tokens_matches_extended_counts(setup):
    host, dev, docs, rng = setup
    pats = [docs[i][:2] for i in range(10)]
    cands = rng.integers(0, 40, size=(10, 8)).astype(np.int32)
    los = np.array([host.get_range(p)[0] for p in pats], dtype=np.int32)
    his = np.array([host.get_range(p)[1] for p in pats], dtype=np.int32)
    got = jax.jit(lambda t, l, h: fm_ops.validate_tokens(dev, t, l, h))(cands, los, his)
    for i, p in enumerate(pats):
        for j in range(8):
            assert int(got[i, j]) == host.get_count(list(p) + [int(cands[i, j])])


def test_contains_tokens_matches_validate(setup):
    """Membership (one binary-search chain) must equal validate > 0 on
    arbitrary intervals: corpus-derived ranges, random sub-intervals,
    empty intervals, the full range, and OOV/sentinel tokens."""
    host, dev, docs, rng = setup
    n = host.size()
    pats = [docs[i][:2] for i in range(10)]
    los = [host.get_range(p)[0] for p in pats]
    his = [host.get_range(p)[1] for p in pats]
    # random sub-intervals + degenerate cases
    for _ in range(20):
        a = int(rng.integers(0, n))
        los.append(a)
        his.append(int(rng.integers(a, n + 1)))
    los += [0, 5, n]
    his += [n, 5, n]  # full range, empty, empty-at-end
    los = np.asarray(los, np.int32)
    his = np.asarray(his, np.int32)
    cands = rng.integers(-2, 45, size=(los.size, 9)).astype(np.int32)
    cands[:, -1] = 39  # max unshifted vocab id
    got = jax.jit(lambda t, l, h: fm_ops.contains_tokens(dev, t, l, h))(
        cands, los, his
    )
    want = jax.jit(lambda t, l, h: fm_ops.validate_tokens(dev, t, l, h))(
        cands, los, his
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want) > 0)


def test_contains_tokens_with_head_directory():
    """contains_tokens must stay exact when the Occ directory tightens the
    search bounds (head symbols at a tiny dir block)."""
    rng = np.random.default_rng(5)
    toks = (rng.zipf(1.2, size=6000) % 28 + 4).astype(np.int64)
    host = FMIndex()
    host.initialize([d.tolist() for d in np.array_split(toks, 120)])
    dev = DeviceFMIndex.from_host(host, vocab=40, dir_shift=6)
    assert dev.head_pair is not None
    n = host.size()
    los = rng.integers(0, n, size=64).astype(np.int32)
    his = np.minimum(los + rng.integers(0, n, size=64), n).astype(np.int32)
    cands = rng.integers(0, 40, size=(64, 8)).astype(np.int32)
    got = jax.jit(lambda t, l, h: fm_ops.contains_tokens(dev, t, l, h))(
        cands, los, his
    )
    want = jax.jit(lambda t, l, h: fm_ops.validate_tokens(dev, t, l, h))(
        cands, los, his
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want) > 0)


def test_locate_and_doc_index(setup):
    host, dev, docs, rng = setup
    rows = rng.integers(0, host.size(), size=50).astype(np.int32)
    got = np.asarray(jax.jit(lambda r: fm_ops.locate_rows(dev, r))(rows))
    expect = np.array([host.locate(int(r)) for r in rows])
    np.testing.assert_array_equal(got, expect)

    positions = rng.integers(0, len(host), size=50).astype(np.int32)
    gd = np.asarray(jax.jit(lambda p: fm_ops.doc_index_of(dev, p))(positions))
    ed = np.array([host.get_doc_index(int(p)) for p in positions])
    np.testing.assert_array_equal(gd, ed)
    # out-of-bounds row
    assert int(fm_ops.locate_rows(dev, jnp.int32(host.size() + 5))) == -1


def test_dense_counts_exact(setup):
    host, dev, docs, rng = setup
    pats = [[], [docs[0][0]], docs[1][:2], [999]]
    for pat in pats:
        lo, hi = host.get_range(pat)
        counts = np.asarray(
            jax.jit(lambda l, h: fm_ops.dense_counts(dev, l, h, chunk=16))(
                jnp.int32(lo), jnp.int32(hi)
            )
        )
        assert counts.shape == (40,)
        for tok in range(40):
            assert counts[tok] == host.get_count(list(pat) + [tok]), (pat, tok)


def test_dense_counts_batched_shape(setup):
    host, dev, docs, rng = setup
    lo = jnp.zeros((3, 2), jnp.int32)
    hi = jnp.full((3, 2), host.size(), jnp.int32)
    counts = fm_ops.dense_counts(dev, lo, hi, chunk=16)
    assert counts.shape == (3, 2, 40)
    np.testing.assert_array_equal(
        np.asarray(counts[0, 0]), np.asarray(counts[2, 1])
    )
    np.testing.assert_array_equal(
        np.asarray(counts[0, 0]), np.asarray(dev.corpus_counts)
    )


def test_head_directory_rank_and_ranges():
    """The head-symbol Occ directory (frequent symbols pinned to one
    position block) must leave every rank/backward-search result
    bit-identical to the undirected search -- fuzzed on a skewed corpus
    with a tiny dir block so head rows genuinely engage."""
    rng = np.random.default_rng(3)
    # Zipf-ish: symbol 4 dominates, several mid symbols exceed 64 counts
    toks = (rng.zipf(1.2, size=6000) % 28 + 4).astype(np.int64)
    docs = np.array_split(toks, 120)
    host = FMIndex()
    host.initialize([d.tolist() for d in docs])
    dev = DeviceFMIndex.from_host(host, vocab=40, dir_shift=6)
    assert dev.head_pair is not None and dev.dir_shift == 6
    assert dev.search_iters <= 7  # capped by the 64-row directory block
    undirected = DeviceFMIndex.from_host(host, vocab=40, dir_shift=31)
    assert undirected.head_pair is None  # blocks never exceed 2^31

    n = host.size()
    symbols = rng.integers(0, host.C.size - 1, size=256).astype(np.int32)
    positions = rng.integers(0, n + 1, size=256).astype(np.int32)
    got = jax.jit(lambda s, p: fm_ops.rank(dev, s, p))(symbols, positions)
    expect = np.array([host.occ(int(s), int(p)) for s, p in zip(symbols, positions)])
    np.testing.assert_array_equal(np.asarray(got), expect)

    pats = [rng.integers(0, 34, size=rng.integers(1, 5)).tolist() for _ in range(80)]
    L = max(len(p) for p in pats)
    tk = np.zeros((len(pats), L), dtype=np.int32)
    lens = np.array([len(p) for p in pats], dtype=np.int32)
    for i, p in enumerate(pats):
        tk[i, : len(p)] = p
    lo, hi = jax.jit(lambda t, l: fm_ops.range_for_sequences(dev, t, l))(tk, lens)
    lo0, hi0 = jax.jit(lambda t, l: fm_ops.range_for_sequences(undirected, t, l))(tk, lens)
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(lo0))
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(hi0))
    for i, p in enumerate(pats):
        assert (int(lo[i]), int(hi[i])) == host.get_range(p), p


def test_int32_row_guard_raises_cleanly():
    """Both device layouts must REFUSE >= 2^31-row builds (BASELINE.md: the
    2.5B-token configuration is sharded-only) before touching any array."""
    from seal_tpu.index.wavelet import WaveletFMIndex

    class Huge:
        def size(self):
            return 2**31

    with pytest.raises(ValueError, match="sharded index"):
        DeviceFMIndex.from_host(Huge(), vocab=50265)
    with pytest.raises(ValueError, match="sharded index"):
        WaveletFMIndex.from_host(Huge(), vocab=50265)
