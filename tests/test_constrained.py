"""Parity tests of the fused constrained beam search.

1. exact-mode device search == slow Python mirror of the reference spec
   (same hypothesis sets and scores);
2. speculative mode == exact mode when the candidate budget covers the vocab;
3. the core invariant: every finite-score hypothesis, stripped like the
   searcher does, occurs in the corpus (count > 0) -- reference
   ``retrieval.py:91``.
"""

import numpy as np
import pytest

import jax

from seal_tpu.decoding.generate import fm_index_generate, pad_batch
from seal_tpu.index import FMIndex
from seal_tpu.index.device_index import DeviceFMIndex
from seal_tpu.models import bart
from seal_tpu.models.config import bart_tiny

from tests.reference_impl import reference_generate

VOCAB = 60


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(3)
    # docs over ids 4..VOCAB-1 (0..3 reserved), ending with EOS=2 like the
    # reference's corpus build (build_fm_index.py:132)
    docs = [
        rng.integers(4, VOCAB, size=rng.integers(5, 25)).tolist() + [2] for _ in range(30)
    ]
    host = FMIndex()
    host.initialize(docs)
    cfg = bart_tiny(vocab_size=VOCAB)
    dev = DeviceFMIndex.from_host(host, vocab=VOCAB)
    params = bart.init_params(jax.random.PRNGKey(1), cfg)
    queries = [
        [0] + rng.integers(4, VOCAB, size=6).tolist() + [2],
        [0] + rng.integers(4, VOCAB, size=4).tolist() + [2],
    ]
    ids, mask = pad_batch(queries, cfg.pad_token_id)
    return cfg, params, host, dev, ids, mask


def canon(hyps):
    """tokens -> best score (device f32 vs mirror f64 differ by ~1e-3)."""
    out = {}
    for s, t in hyps:
        key = tuple(t)
        if key not in out or s > out[key]:
            out[key] = s
    return out


def assert_same_hyps(got, expect, atol=5e-3):
    g, e = canon(got), canon(expect)
    assert set(g) == set(e), (sorted(set(g) - set(e))[:5], sorted(set(e) - set(g))[:5])
    for k in g:
        assert abs(g[k] - e[k]) < atol, (k, g[k], e[k])


@pytest.mark.parametrize(
    "kw",
    [
        dict(num_beams=4, max_length=6, min_length=0),
        dict(num_beams=3, max_length=5, min_length=3),
        dict(num_beams=3, max_length=6, min_length=0, stop_at_count=2),
        dict(num_beams=3, max_length=5, min_length=0, always_allow_eos=True),
        dict(num_beams=3, max_length=5, min_length=0, disable_fm_index=True),
    ],
)
def test_exact_matches_reference_mirror(world, kw):
    cfg, params, host, dev, ids, mask = world
    got = fm_index_generate(
        cfg, params, dev, ids, mask, exact_mask=True, forced_bos_token_id=None, **kw
    )
    expect = reference_generate(cfg, params, host, ids, mask, **kw)
    for b in range(len(got)):
        assert_same_hyps(got[b], expect[b])


def test_force_decoding_from(world):
    cfg, params, host, dev, ids, mask = world
    # condition on a token that exists in the corpus
    force = [int(host.get_doc(0)[0])]
    kw = dict(num_beams=3, max_length=5, min_length=0)
    got = fm_index_generate(
        cfg, params, dev, ids, mask, exact_mask=True, forced_bos_token_id=None,
        force_decoding_from=force, **kw
    )
    expect = reference_generate(cfg, params, host, ids, mask, force_decoding_from=force, **kw)
    for b in range(len(got)):
        assert_same_hyps(got[b], expect[b])


def test_speculative_matches_exact_with_full_budget(world):
    cfg, params, host, dev, ids, mask = world
    kw = dict(num_beams=4, max_length=6, min_length=0, forced_bos_token_id=None)
    exact = fm_index_generate(cfg, params, dev, ids, mask, exact_mask=True, **kw)
    spec = fm_index_generate(
        cfg, params, dev, ids, mask, exact_mask=False, top_m=VOCAB, window=16, **kw
    )
    for b in range(len(exact)):
        assert_same_hyps(spec[b], exact[b], atol=1e-4)


def test_speculative_small_budget_keys_are_grounded(world):
    cfg, params, host, dev, ids, mask = world
    out = fm_index_generate(
        cfg, params, dev, ids, mask,
        num_beams=4, max_length=7, min_length=0, forced_bos_token_id=None,
        top_m=8, window=4,
    )
    checked = 0
    for hyps in out:
        assert hyps
        for score, toks in hyps:
            seq = toks[1:]  # strip decoder_start
            while seq and seq[0] in (0, 2):
                seq = seq[1:]
            if seq and seq[-1] in (0, 2, 1):
                seq = seq[:-1]
            seq = [t for t in seq if t != 1]
            if not seq:
                continue
            # drop anything after the first EOS/PAD (finished-beam padding)
            cut = next((i for i, t in enumerate(seq) if t in (1, 2)), len(seq))
            seq = seq[:cut]
            if seq:
                assert host.get_count(seq) > 0, (score, toks)
                checked += 1
    assert checked > 20


def test_forced_bos(world):
    cfg, params, host, dev, ids, mask = world
    out = fm_index_generate(
        cfg, params, dev, ids, mask,
        num_beams=3, max_length=5, min_length=0, forced_bos_token_id=0, exact_mask=True,
    )
    for hyps in out:
        for _, toks in hyps:
            assert toks[0] == cfg.decoder_start_token_id
            assert toks[1] == 0


def test_dense_budget_guard(world):
    """exact_mask at TPU-worker-crashing shapes must fail BEFORE dispatch
    with an actionable error (CLAUDE.md gotcha: batch 32 x beam 15 x 50k
    vocab hard-crashes the worker instead of OOMing)."""
    from seal_tpu.decoding import constrained

    cfg, params, host, dev, ids, mask = world
    old = constrained.DENSE_MASK_BUDGET
    old_backends = constrained.DENSE_GUARD_BACKENDS
    constrained.DENSE_MASK_BUDGET = 100  # 2 queries x 3 beams x 60 vocab = 360
    # the guard fires only on TPU backends; include cpu to exercise it here
    constrained.DENSE_GUARD_BACKENDS = old_backends | {"cpu"}
    try:
        with pytest.raises(ValueError, match="dense constraint mask"):
            fm_index_generate(
                cfg, params, dev, ids, mask,
                num_beams=3, max_length=5, min_length=0, exact_mask=True,
            )
    finally:
        constrained.DENSE_MASK_BUDGET = old
        constrained.DENSE_GUARD_BACKENDS = old_backends
