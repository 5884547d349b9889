"""Tests for the sampling / top-k warper / diverse-beam-group decode modes."""

import numpy as np
import pytest

import jax

from seal_tpu.decoding.generate import fm_index_generate, pad_batch
from seal_tpu.index import FMIndex
from seal_tpu.index.device_index import DeviceFMIndex
from seal_tpu.models import bart
from seal_tpu.models.config import bart_tiny

VOCAB = 60


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(5)
    docs = [
        rng.integers(4, VOCAB, size=rng.integers(5, 25)).tolist() + [2] for _ in range(30)
    ]
    host = FMIndex()
    host.initialize(docs)
    cfg = bart_tiny(vocab_size=VOCAB)
    dev = DeviceFMIndex.from_host(host, vocab=VOCAB)
    params = bart.init_params(jax.random.PRNGKey(2), cfg)
    queries = [[0] + rng.integers(4, VOCAB, size=5).tolist() + [2] for _ in range(2)]
    ids, mask = pad_batch(queries, cfg.pad_token_id)
    return cfg, params, host, dev, ids, mask


def _grounded(host, toks):
    seq = toks[1:]
    cut = next((i for i, t in enumerate(seq) if t in (1, 2)), len(seq))
    seq = seq[:cut]
    return (not seq) or host.get_count(seq) > 0


def test_sampling_mode_grounded_and_seeded(world):
    cfg, params, host, dev, ids, mask = world
    kw = dict(
        num_beams=4, max_length=6, min_length=0, forced_bos_token_id=None,
        exact_mask=True, sample=True,
    )
    out1 = fm_index_generate(cfg, params, dev, ids, mask, seed=7, **kw)
    out2 = fm_index_generate(cfg, params, dev, ids, mask, seed=7, **kw)
    out3 = fm_index_generate(cfg, params, dev, ids, mask, seed=8, **kw)
    assert out1 == out2  # deterministic under the same seed
    assert out1 != out3  # different seed -> different samples (overwhelmingly)
    for hyps in out1:
        assert hyps
        for _, toks in hyps:
            assert _grounded(host, toks), toks


def test_sampling_chains_diverge(world):
    cfg, params, host, dev, ids, mask = world
    out = fm_index_generate(
        cfg, params, dev, ids, mask,
        num_beams=6, max_length=6, min_length=0, forced_bos_token_id=None,
        exact_mask=True, sample=True, seed=0,
    )
    # final 6 chains per query should not be all identical
    finals = [tuple(t) for _, t in out[0] if len(t) == 6]
    assert len(set(finals)) > 1


def test_topk_warper_restricts_support(world):
    cfg, params, host, dev, ids, mask = world
    # free generation with topk=1 == greedy: all beams collapse to one path
    out = fm_index_generate(
        cfg, params, dev, ids, mask,
        num_beams=3, max_length=5, min_length=0, forced_bos_token_id=None,
        disable_fm_index=True, topk=1,
    )
    for hyps in out:
        finals = {tuple(t) for _, t in hyps if len(t) == 5}
        assert len(finals) == 1


def _ban_even_tokens(logits, cur_len):
    # Marian-style adjust_logits_during_generation stand-in (reference
    # beam_search.py:248): pure jax fn of (raw logits, cur_len)
    del cur_len
    import jax.numpy as jnp

    even = (jnp.arange(logits.shape[-1]) % 2 == 0) & (
        jnp.arange(logits.shape[-1]) >= 4
    )
    return jnp.where(even, -jnp.inf, logits)


def test_adjust_logits_hook_bans_tokens(world):
    cfg, params, host, dev, ids, mask = world
    kw = dict(
        num_beams=4, max_length=6, min_length=0, forced_bos_token_id=None,
    )
    out = fm_index_generate(
        cfg, params, dev, ids, mask, adjust_logits_fn=_ban_even_tokens,
        exact_mask=True, **kw
    )
    out_fast = fm_index_generate(
        cfg, params, dev, ids, mask, adjust_logits_fn=_ban_even_tokens, **kw
    )
    assert out == out_fast  # the hook runs upstream of both proposal paths
    base = fm_index_generate(cfg, params, dev, ids, mask, **kw)
    assert out != base
    for hyps in out:
        assert hyps
        for _, toks in hyps:
            assert _grounded(host, toks), toks
            assert all(t < 4 or t % 2 == 1 for t in toks[1:]), toks


def test_diverse_groups_produce_diverse_beams(world):
    cfg, params, host, dev, ids, mask = world
    common = dict(
        num_beams=4, max_length=6, min_length=0, forced_bos_token_id=None,
        exact_mask=True,
    )
    plain = fm_index_generate(
        cfg, params, dev, ids, mask, diverse_bs_groups=2, diverse_bs_penalty=0.0,
        **common,
    )
    diverse = fm_index_generate(
        cfg, params, dev, ids, mask, diverse_bs_groups=2, diverse_bs_penalty=1e6,
        **common,
    )
    for b in range(2):
        # with a huge penalty, the second group's first tokens must differ
        # from the first group's at every step -> more distinct first tokens
        def first_tokens(hyps):
            return {t[1] for _, t in hyps if len(t) >= 2}

        assert len(first_tokens(diverse[b])) >= len(first_tokens(plain[b]))
    # and all keys remain grounded
    for hyps in diverse:
        for _, toks in hyps:
            assert _grounded(host, toks), toks


def test_diverse_groups_validation():
    from seal_tpu.decoding.constrained import DecodeConfig

    with pytest.raises(ValueError):
        DecodeConfig(num_beams=5, num_groups=2)
    with pytest.raises(ValueError):
        DecodeConfig(sample=True, num_groups=2, num_beams=4)


def test_signature_change_replay(world):
    """Replaying a compiled signature after tracing another must not
    mismatch executables.

    Regression: a module-level ``jnp.uint32`` SWAR constant in ``wt_ops``
    was captured as a jaxpr const (a prepended executable parameter) by
    every wavelet-layout program; after the same jit wrapper traced a
    second signature (other batch shape or the Psi layout), the C++
    fast-path replay of the first raised INVALID_ARGUMENT ("Executable
    expected parameter 0 of size 4...").  Seen end-to-end as ragged-batch
    compact-mode ``batch_search`` crashing on its second batch.
    """
    from seal_tpu.index.wavelet import WaveletFMIndex

    cfg, params, host, dev, ids, mask = world
    wav = WaveletFMIndex.from_host(host, vocab=VOCAB)
    kw = dict(num_beams=3, max_length=4, min_length=0, forced_bos_token_id=None)

    first = fm_index_generate(cfg, params, wav, ids, mask, **kw)
    # same wrapper, three other signatures: smaller batch, then Psi layout
    fm_index_generate(cfg, params, wav, ids[:1], mask[:1], **kw)
    fm_index_generate(cfg, params, dev, ids, mask, **kw)
    # replay of the first compiled signature (the crash site)
    replay = fm_index_generate(cfg, params, wav, ids, mask, **kw)
    assert replay == first
