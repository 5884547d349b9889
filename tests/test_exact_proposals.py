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
    xj = jnp.asarray(x)
    for k in (30, 64, 256):
        v1, i1 = lax.top_k(xj, k)
        v2, i2 = _exact_topk(xj, k)
        assert i2.shape == (24, k)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2)), k
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2)), k
