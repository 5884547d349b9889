"""T5 family: parity vs HF torch T5 + constrained generation smoke."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seal_tpu.models import convert, t5
from seal_tpu.models.t5 import T5Config, t5_tiny

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import T5Config as HFT5Config, T5ForConditionalGeneration

    cfg = t5_tiny(vocab_size=99)
    hf_cfg = HFT5Config(
        vocab_size=cfg.vocab_size,
        d_model=cfg.d_model,
        d_kv=cfg.d_kv,
        d_ff=cfg.d_ff,
        num_layers=cfg.num_layers,
        num_decoder_layers=cfg.num_layers,
        num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        dropout_rate=0.0,
        feed_forward_proj="relu",
        tie_word_embeddings=True,
        pad_token_id=0,
        eos_token_id=1,
        decoder_start_token_id=0,
    )
    torch.manual_seed(0)
    hf = T5ForConditionalGeneration(hf_cfg).eval()
    params = convert.from_hf_t5_state_dict(hf.state_dict(), cfg)
    return cfg, hf, params


def _batch(cfg, b=2, ls=9, lt=5, seed=1):
    rng = np.random.default_rng(seed)
    src = rng.integers(2, cfg.vocab_size, size=(b, ls)).astype(np.int64)
    mask = np.ones((b, ls), np.int64)
    mask[0, -2:] = 0
    src[0, -2:] = cfg.pad_token_id
    tgt = rng.integers(2, cfg.vocab_size, size=(b, lt)).astype(np.int64)
    tgt[:, 0] = cfg.decoder_start_token_id
    return src, mask, tgt


def test_encoder_matches_hf(hf_pair):
    cfg, hf, params = hf_pair
    src, mask, _ = _batch(cfg)
    with torch.no_grad():
        expect = hf.encoder(
            input_ids=torch.tensor(src), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    got = np.asarray(t5.encode(cfg, params, jnp.asarray(src), jnp.asarray(mask)))
    np.testing.assert_allclose(got, expect, atol=2e-4, rtol=1e-3)


def test_full_decode_matches_hf(hf_pair):
    cfg, hf, params = hf_pair
    src, mask, tgt = _batch(cfg)
    with torch.no_grad():
        expect = hf(
            input_ids=torch.tensor(src),
            attention_mask=torch.tensor(mask),
            decoder_input_ids=torch.tensor(tgt),
        ).logits.numpy()
    enc = t5.encode(cfg, params, jnp.asarray(src), jnp.asarray(mask))
    got = np.asarray(t5.decode_full(cfg, params, enc, jnp.asarray(mask), jnp.asarray(tgt)))
    np.testing.assert_allclose(got, expect, atol=2e-3, rtol=1e-3)


def test_incremental_matches_full(hf_pair):
    cfg, _, params = hf_pair
    src, mask, tgt = _batch(cfg)
    enc = t5.encode(cfg, params, jnp.asarray(src), jnp.asarray(mask))
    full = t5.decode_full(cfg, params, enc, jnp.asarray(mask), jnp.asarray(tgt))
    cache = t5.empty_self_cache(cfg, src.shape[0], 8)
    ckv = t5.precompute_cross_kv(cfg, params, enc)
    ebias = t5.encoder_bias(jnp.asarray(mask))
    step_fn = jax.jit(
        lambda tok, i, c: t5.decode_step(cfg, params, tok, i, c, ckv, ebias)
    )
    for t in range(tgt.shape[1]):
        logits, cache = step_fn(jnp.asarray(tgt[:, t]), jnp.int32(t), cache)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, t, :]), atol=2e-3, rtol=1e-3
        )


def test_t5_constrained_generation():
    """T5 through the family-agnostic fused decoder: keys must be grounded."""
    from seal_tpu.decoding.generate import fm_index_generate, pad_batch
    from seal_tpu.index import FMIndex
    from seal_tpu.index.device_index import DeviceFMIndex

    rng = np.random.default_rng(1)
    cfg = t5_tiny(vocab_size=60)
    # T5 convention: docs end with eos=1; ids 2..59 content
    docs = [rng.integers(2, 60, size=rng.integers(5, 20)).tolist() + [1] for _ in range(20)]
    host = FMIndex()
    host.initialize(docs)
    dev = DeviceFMIndex.from_host(host, vocab=60)
    params = t5.init_params(jax.random.PRNGKey(0), cfg)
    queries = [[5, 6, 7, 1], [8, 9, 1]]
    ids, mask = pad_batch(queries, cfg.pad_token_id)
    out = fm_index_generate(
        cfg, params, dev, ids, mask,
        num_beams=3, max_length=5, min_length=0, forced_bos_token_id=None,
        exact_mask=True,
    )
    checked = 0
    for hyps in out:
        assert hyps
        for _, toks in hyps:
            seq = toks[1:]  # strip decoder_start (=0=pad for T5)
            cut = next((i for i, t in enumerate(seq) if t in (0, 1)), len(seq))
            seq = seq[:cut]
            if seq:
                assert host.get_count(seq) > 0, toks
                checked += 1
    assert checked > 10
