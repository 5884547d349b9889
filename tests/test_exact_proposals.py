"""The default (exact-loop) constrained decode must match the dense parity
mode bit-for-bit: same hypotheses, same scores, under tiny proposal budgets
that force many while-loop rounds, bucket pruning, and window exhaustion.

This is the guarantee that replaces the reference's ``interval_symbols``
full distinct-set masks (``/root/reference/seal/cpp_modules/fm_index.cpp:78-131``).
"""

import numpy as np
import pytest

import jax

from seal_tpu.decoding.generate import fm_index_generate, pad_batch
from seal_tpu.index import FMIndex
from seal_tpu.index.device_index import DeviceFMIndex
from seal_tpu.models import bart
from seal_tpu.models.config import bart_tiny


@pytest.fixture(scope="module")
def setup():
    cfg = bart_tiny(vocab_size=96)
    params = bart.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _hyps_key(hyps):
    return sorted((round(s, 4), tuple(t)) for s, t in hyps)


@pytest.mark.parametrize("seed,stop_at_count", [(0, 0), (1, 0), (2, 2), (3, 1)])
def test_exact_loop_matches_dense(setup, seed, stop_at_count):
    cfg, params = setup
    rng = np.random.default_rng(seed)
    docs = [
        rng.integers(4, 90, size=rng.integers(5, 30)).tolist() + [2]
        for _ in range(30)
    ]
    host = FMIndex()
    host.initialize(docs)
    idx = DeviceFMIndex.from_host(host, vocab=96)
    queries = [[0] + rng.integers(4, 90, size=5).tolist() + [2] for _ in range(3)]
    ids, mask = pad_batch(queries, cfg.pad_token_id)
    common = dict(
        num_beams=4,
        max_length=6,
        min_length=1,
        forced_bos_token_id=None,
        stop_at_count=stop_at_count,
    )
    # tiny budgets: exactness must not depend on them
    loop = fm_index_generate(
        cfg, params, idx, ids, mask, top_m=8, window=4, exact_chunk=4, **common
    )
    dense = fm_index_generate(cfg, params, idx, ids, mask, exact_mask=True, **common)
    for ql, qd in zip(loop, dense):
        assert _hyps_key(ql) == _hyps_key(qd)


def test_tied_logits_match_dense(setup):
    """Adversarial exact ties: a block of tokens shares identical logits at
    every step (duplicate embedding rows).  Tie retention and ordering must
    resolve token-ascending, exactly like the dense token-indexed mode."""
    import jax.numpy as jnp

    cfg, params = setup
    rng = np.random.default_rng(11)
    tied = list(range(10, 26))
    docs = [
        [int(t) for t in rng.choice(tied, size=10)] + [2] for _ in range(30)
    ]
    host = FMIndex()
    host.initialize(docs)
    idx = DeviceFMIndex.from_host(host, vocab=96)
    params2 = dict(params)
    shared = np.array(params2["shared"])
    shared[tied] = shared[tied[0]]
    params2["shared"] = jnp.asarray(shared)
    queries = [[0] + rng.integers(4, 90, size=4).tolist() + [2] for _ in range(2)]
    ids, mask = pad_batch(queries, cfg.pad_token_id)
    common = dict(num_beams=4, max_length=5, min_length=1,
                  forced_bos_token_id=None, exact_ties=True)
    loop = fm_index_generate(
        cfg, params2, idx, ids, mask, top_m=8, window=4, exact_chunk=4, **common
    )
    dense = fm_index_generate(cfg, params2, idx, ids, mask, exact_mask=True, **common)
    for ql, qd in zip(loop, dense):
        assert _hyps_key(ql) == _hyps_key(qd)


def test_skewed_corpus_few_continuations(setup):
    """Adversarial shape: huge interval, few distinct continuations.

    One dominant bigram (a->b) repeated thousands of times plus noise docs;
    after choosing `a` the beam's interval is far larger than the window but
    has very few distinct continuations -- the regime that forces the loop
    through bucket pruning and the dead-space terminator.
    """
    cfg, params = setup
    rng = np.random.default_rng(7)
    docs = [[10, 11] * 40 + [2] for _ in range(40)]
    docs += [rng.integers(4, 90, size=20).tolist() + [2] for _ in range(10)]
    host = FMIndex()
    host.initialize(docs)
    idx = DeviceFMIndex.from_host(host, vocab=96)
    queries = [[0] + rng.integers(4, 90, size=4).tolist() + [2] for _ in range(2)]
    ids, mask = pad_batch(queries, cfg.pad_token_id)
    common = dict(num_beams=3, max_length=5, min_length=1, forced_bos_token_id=None)
    loop = fm_index_generate(
        cfg, params, idx, ids, mask, top_m=8, window=4, exact_chunk=4, **common
    )
    dense = fm_index_generate(cfg, params, idx, ids, mask, exact_mask=True, **common)
    for ql, qd in zip(loop, dense):
        assert _hyps_key(ql) == _hyps_key(qd)


def test_oov_corpus_symbols_never_proposed(setup):
    """Index built with model vocab SMALLER than the corpus alphabet: the
    out-of-vocab symbols are legal corpus continuations but must never be
    proposed (window enumeration reads them straight off the BWT; an OOV
    token indexed into [.., vocab] logprobs yields garbage/NaN which top_k
    ranks first).  Advisor round-2 medium finding."""
    cfg, params = setup  # model vocab 96
    rng = np.random.default_rng(5)
    # corpus alphabet reaches 140 -- symbols 96..139 are out of model vocab
    docs = [
        rng.integers(4, 140, size=rng.integers(8, 25)).tolist() + [2]
        for _ in range(40)
    ]
    host = FMIndex()
    host.initialize(docs)
    idx = DeviceFMIndex.from_host(host, vocab=96)
    queries = [[0] + rng.integers(4, 90, size=4).tolist() + [2] for _ in range(2)]
    ids, mask = pad_batch(queries, cfg.pad_token_id)
    common = dict(num_beams=4, max_length=6, min_length=1, forced_bos_token_id=None)
    loop = fm_index_generate(
        cfg, params, idx, ids, mask, top_m=8, window=4, exact_chunk=4, **common
    )
    dense = fm_index_generate(cfg, params, idx, ids, mask, exact_mask=True, **common)
    for ql, qd in zip(loop, dense):
        for s, toks in ql:
            assert all(t < 96 for t in toks), toks
            assert np.isfinite(s), (s, toks)
        assert _hyps_key(ql) == _hyps_key(qd)


def test_exact_topk_matches_lax_topk():
    """The block-max two-level top-k must equal lax.top_k bit-for-bit,
    including (value desc, index asc) tie order, at vocab scale."""
    import jax.numpy as jnp
    from jax import lax

    from seal_tpu.decoding.constrained import _exact_topk

    rng = np.random.default_rng(0)
    V = 50265
    # heavy ties: quantized values + -inf rows + plateaus spanning blocks
    x = np.round(rng.normal(0, 2, size=(24, V)), 1).astype(np.float32)
    x[3] = -np.inf
    x[5, :4000] = 7.5  # plateau across many blocks
    x[7, 100:200] = x[7, 300:400] = 9.25
    # tail-block stress (the tail-split gather: the final PARTIAL block is
    # appended as its own slab segment; a tail-chosen gathered row is dead):
    x[9, V - 40 :] = 50.0  # top values live in the tail columns
    x[11] = -np.inf
    x[11, V - 3 :] = 1.0  # few real values, all in the tail: -inf fill + tail pick
    x[13, V - 257 :] = 8.0  # plateau straddling the last full block + tail
    xj = jnp.asarray(x)
    for k in (30, 64, 256):
        v1, i1 = lax.top_k(xj, k)
        # 128 is the production default (DecodeConfig.exact_topk_blk);
        # 32/64 stay covered as tunable operating points
        for blk in (32, 64, 128):
            v2, i2 = _exact_topk(xj, k, blk=blk)
            assert i2.shape == (24, k)
            np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2)), (k, blk)
            np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2)), (k, blk)


def test_slab_filled_buffer_does_not_stop_lm_sweep():
    """A buffer filled by valid-but-low-lp slab tokens must NOT terminate
    the LM sweep: completeness requires the buffer minimum to dominate the
    unexamined lp region (round-3 review finding -- the loop previously
    stopped on n_valid >= n_buf alone and dropped a higher-lp allowed
    token past the examined prefix)."""
    import jax.numpy as jnp

    from seal_tpu.decoding.constrained import (
        DecodeConfig,
        SingleIndexOps,
        _exact_proposals,
    )

    V = 30
    # units [c, 10, x]: the interval of prefix [10] has 9 rows; the first 8
    # BWT symbols are the low-lp continuations {11..14}, row 8 holds the
    # high-lp continuation 15
    units = [
        (20, 11), (21, 12), (22, 13), (23, 14),
        (24, 11), (25, 12), (26, 13), (27, 14),
        (28, 15),
    ]
    doc = []
    for c, x in units:
        doc += [c, 10, x]
    host = FMIndex()
    host.initialize([doc])
    dev = DeviceFMIndex.from_host(host, vocab=V)
    ops = SingleIndexOps(dev)

    lo, hi = host.get_range([10])
    K = 2
    # chunk = max(exact_chunk, 2 * n_buf) = 8 < interval size 9, window 4:
    # round 0's slab enumerates 8 rows ({11..14} twice) and fills the
    # 4-slot buffer before the LM sweep (whose top-8 are invalid tokens)
    # reaches token 15 at LM rank 9
    cfg = DecodeConfig(num_beams=K, exact_chunk=1, window=4)
    B = 1
    lp = np.full((B, K, V), -100.0, np.float32)
    for i in range(8):
        lp[:, :, i] = -1.0 - 0.01 * i  # LM top-8: tokens not in the corpus
    lp[:, :, 15] = -2.0  # allowed, LM rank 9
    for x in (11, 12, 13, 14):
        lp[:, :, x] = -50.0 - x  # allowed, low lp (the slab flood)

    lo_a = jnp.full((B, K), lo, jnp.int32)
    hi_a = jnp.full((B, K), hi, jnp.int32)
    buf_tok, buf_lp, buf_valid, _ = jax.jit(
        lambda lp_, lo_, hi_, pc, fin, pl, et: _exact_proposals(
            ops, cfg, lp_, lo_, hi_, pc, fin, pl, et
        )
    )(
        jnp.asarray(lp).reshape(B * K, V),  # _exact_proposals takes FLAT lp
        lo_a,
        hi_a,
        jnp.full((B, K), hi - lo, jnp.int32),
        jnp.zeros((B, K), bool),
        jnp.asarray(lp[..., cfg.pad_token_id][..., None]),
        jnp.full((B, K, 1), cfg.eos_token_id, jnp.int32),
    )
    got = {
        int(t)
        for t, v in zip(np.asarray(buf_tok)[0, 0], np.asarray(buf_valid)[0, 0])
        if v
    }
    truth = set(
        sorted(host.get_distinct(lo, hi), key=lambda t: -float(lp[0, 0, t]))[: 2 * K]
    )
    assert got == truth, (sorted(got), sorted(truth))


def test_fast_select_falls_back_when_missed_token_reaches_cutoff():
    """The round-0 fast path must detect that an unproven beam's missed
    tokens could reach the global selection cutoff and fall back to the
    full proof loop: same adversarial shape as the slab-filled test (the
    high-lp allowed token sits past the examined prefix while the slab
    floods the buffer), but driven through ``_fast_exact_select`` -- the
    selected candidate set must contain the missed token, exactly as the
    dense mode would select it."""
    import jax.numpy as jnp

    from seal_tpu.decoding.constrained import (
        DecodeConfig,
        SingleIndexOps,
        _fast_exact_select,
    )

    V = 30
    units = [
        (20, 11), (21, 12), (22, 13), (23, 14),
        (24, 11), (25, 12), (26, 13), (27, 14),
        (28, 15),
    ]
    doc = []
    for c, x in units:
        doc += [c, 10, x]
    host = FMIndex()
    host.initialize([doc])
    dev = DeviceFMIndex.from_host(host, vocab=V)
    ops = SingleIndexOps(dev)

    lo, hi = host.get_range([10])
    K = 2
    cfg = DecodeConfig(num_beams=K, exact_chunk=1, window=4)
    B = 1
    lp = np.full((B, K, V), -100.0, np.float32)
    for i in range(8):
        lp[:, :, i] = -1.0 - 0.01 * i  # LM top-8: tokens not in the corpus
    lp[:, :, 15] = -2.0  # allowed, LM rank 9 -- past round 0's prefix
    for x in (11, 12, 13, 14):
        lp[:, :, x] = -50.0 - x  # allowed, low lp (the slab flood)

    args = (
        jnp.asarray(lp),
        jnp.full((B, K), lo, jnp.int32),
        jnp.full((B, K), hi, jnp.int32),
        jnp.full((B, K), hi - lo, jnp.int32),
        jnp.zeros((B, K), bool),
        jnp.zeros((B, K), jnp.float32),
    )
    out, fellback = jax.jit(
        lambda lp_, lo_, hi_, pc, fin, bs: _fast_exact_select(
            ops, cfg, lp_.reshape(B * K, V), lo_, hi_, pc, fin, bs, K, V
        )
    )(*args)
    # new (deferred-fallback) contract: the fast result is returned
    # unconditionally together with the unsoundness flag; the scan caller
    # re-runs with force_full=True when any step raised it
    assert bool(fellback), "the unsound round-0 proof must raise the flag"
    out, fb2 = jax.jit(
        lambda lp_, lo_, hi_, pc, fin, bs: _fast_exact_select(
            ops, cfg, lp_.reshape(B * K, V), lo_, hi_, pc, fin, bs, K, V,
            force_full=True,
        )
    )(*args)
    assert not bool(fb2)
    c_tok, _, c_sco, c_fin = (np.asarray(x) for x in out[:4])
    selected = {int(t) for t, f in zip(c_tok[0], c_fin[0]) if f}
    # dense semantics: global top-2K by cons = beam(0) + lp; with both
    # beams identical, that is {15 (lp -2), 11 (lp -61)} per beam
    assert 15 in selected, (selected, c_tok, c_sco)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lm_averse_corpus_matches_dense(setup, seed):
    """Fuzz an LM-averse operating point: the corpus alphabet is biased
    DOWN so every LM-preferred token is invalid and the slab floods the
    buffer with low-lp valid tokens, while a handful of corpus tokens get a
    mid-level bias.  Breadth coverage around the slab-termination fix --
    the deterministic catcher for that bug is
    test_slab_filled_buffer_does_not_stop_lm_sweep (this fuzz's random
    interval orderings usually surface the mid tokens via the slab too,
    so it passes either way)."""
    import jax.numpy as jnp

    cfg, params = setup
    rng = np.random.default_rng(100 + seed)
    corpus_alphabet = list(range(40, 70))
    docs = [
        [int(t) for t in rng.choice(corpus_alphabet, size=rng.integers(6, 20))] + [2]
        for _ in range(25)
    ]
    host = FMIndex()
    host.initialize(docs)
    idx = DeviceFMIndex.from_host(host, vocab=96)
    params2 = dict(params)
    bias = np.zeros(96, np.float32)
    bias[corpus_alphabet] = -8.0  # LM top ranks go to invalid tokens
    mid = rng.choice(corpus_alphabet, size=4, replace=False)
    bias[mid] = -2.0  # allowed, above the slab flood, below the invalid top
    params2["final_logits_bias"] = params2["final_logits_bias"] + jnp.asarray(bias)
    queries = [[0] + rng.integers(4, 90, size=4).tolist() + [2] for _ in range(2)]
    ids, mask = pad_batch(queries, cfg.pad_token_id)
    common = dict(num_beams=4, max_length=5, min_length=1, forced_bos_token_id=None)
    loop = fm_index_generate(
        cfg, params2, idx, ids, mask, top_m=8, window=4, exact_chunk=1, **common
    )
    dense = fm_index_generate(cfg, params2, idx, ids, mask, exact_mask=True, **common)
    for ql, qd in zip(loop, dense):
        assert _hyps_key(ql) == _hyps_key(qd)


def test_host_redo_on_fallback_through_generate():
    """The deferred fallback end to end: a decode whose round-0 proof fails
    must (a) report fallback_steps > 0 and (b) produce keys via the
    host-side force_full redispatch (generate.py) that are all grounded --
    the corrected selection, not the unsound fast one."""
    import jax.numpy as jnp

    from seal_tpu.decoding import generate
    from seal_tpu.models import bart as bart_mod
    from seal_tpu.models.config import bart_tiny

    V = 30
    units = [
        (20, 11), (21, 12), (22, 13), (23, 14),
        (24, 11), (25, 12), (26, 13), (27, 14),
        (28, 15),
    ]
    doc = []
    for c, x in units:
        doc += [c, 10, x]
    host = FMIndex()
    host.initialize([doc])
    dev = DeviceFMIndex.from_host(host, vocab=V)
    cfg = bart_tiny(vocab_size=V)
    params = dict(bart_mod.init_params(jax.random.PRNGKey(0), cfg))
    bias = np.full(V, -100.0, np.float32)
    for i in range(8):
        bias[i] = -1.0 - 0.01 * i  # LM top-8: not in the corpus
    bias[15] = -2.0  # allowed, hidden past round 0's examined prefix
    for x in (11, 12, 13, 14):
        bias[x] = -50.0 - x  # the slab flood
    bias[10] = -3.0
    # weights ~0 + strong bias => lp ~ log_softmax(8 * bias): the same
    # adversarial shape as the direct _fast_exact_select test above
    params["final_logits_bias"] = params["final_logits_bias"] * 0 + bias * 8.0

    out = generate.fm_index_generate(
        cfg, params, dev,
        jnp.asarray([[0, 5, 6, 2]], jnp.int32), jnp.ones((1, 4), jnp.int32),
        num_beams=2, max_length=6, exact_chunk=1, window=4,
    )
    assert generate.LAST_DECODE_STATS["fallback_steps"] > 0
    n = 0
    for hyps in out:
        for _score, key in hyps:
            key = [
                t for t in key
                if t not in (cfg.eos_token_id, cfg.pad_token_id, cfg.bos_token_id)
            ]
            if key:
                assert host.get_count(key) > 0, key
                n += 1
    assert n > 0
