"""BART parity tests: our pure-JAX implementation vs HF torch BART (random
weights, tiny config) and incremental-vs-full decode equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seal_tpu.models import bart
from seal_tpu.models.config import BartConfig, bart_tiny
from seal_tpu.models import convert

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import BartConfig as HFBartConfig, BartForConditionalGeneration

    cfg = bart_tiny(vocab_size=99)
    hf_cfg = HFBartConfig(
        vocab_size=cfg.vocab_size,
        d_model=cfg.d_model,
        encoder_layers=cfg.encoder_layers,
        decoder_layers=cfg.decoder_layers,
        encoder_attention_heads=cfg.encoder_attention_heads,
        decoder_attention_heads=cfg.decoder_attention_heads,
        encoder_ffn_dim=cfg.encoder_ffn_dim,
        decoder_ffn_dim=cfg.decoder_ffn_dim,
        max_position_embeddings=cfg.max_position_embeddings,
        activation_function="gelu",
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        scale_embedding=False,
        pad_token_id=1,
        bos_token_id=0,
        eos_token_id=2,
        decoder_start_token_id=2,
        forced_eos_token_id=None,
    )
    torch.manual_seed(0)
    hf_model = BartForConditionalGeneration(hf_cfg).eval()
    params = convert.from_hf_torch_state_dict(hf_model.state_dict(), cfg)
    return cfg, hf_model, params


def _random_batch(cfg, b=3, lsrc=11, ltgt=7, seed=1):
    rng = np.random.default_rng(seed)
    src = rng.integers(3, cfg.vocab_size, size=(b, lsrc)).astype(np.int64)
    src_mask = np.ones((b, lsrc), dtype=np.int64)
    src_mask[0, -3:] = 0  # padding in one row
    src[0, -3:] = cfg.pad_token_id
    tgt = rng.integers(3, cfg.vocab_size, size=(b, ltgt)).astype(np.int64)
    tgt[:, 0] = cfg.decoder_start_token_id
    return src, src_mask, tgt


def test_encoder_matches_hf(hf_pair):
    cfg, hf_model, params = hf_pair
    src, src_mask, _ = _random_batch(cfg)
    with torch.no_grad():
        expect = hf_model.model.encoder(
            input_ids=torch.tensor(src), attention_mask=torch.tensor(src_mask)
        ).last_hidden_state.numpy()
    got = np.asarray(bart.encode(cfg, params, jnp.asarray(src), jnp.asarray(src_mask)))
    np.testing.assert_allclose(got, expect, atol=2e-4, rtol=1e-4)


def test_full_decode_logits_match_hf(hf_pair):
    cfg, hf_model, params = hf_pair
    src, src_mask, tgt = _random_batch(cfg)
    with torch.no_grad():
        expect = hf_model(
            input_ids=torch.tensor(src),
            attention_mask=torch.tensor(src_mask),
            decoder_input_ids=torch.tensor(tgt),
        ).logits.numpy()
    enc = bart.encode(cfg, params, jnp.asarray(src), jnp.asarray(src_mask))
    got = np.asarray(bart.decode_full(cfg, params, enc, jnp.asarray(src_mask), jnp.asarray(tgt)))
    # cross-framework float32 accumulation noise: layers agree to ~2e-4, the
    # tied LM head amplifies to ~1e-3 absolute on O(1)-magnitude logits
    np.testing.assert_allclose(got, expect, atol=2e-3, rtol=1e-3)


def test_incremental_matches_full(hf_pair):
    cfg, _, params = hf_pair
    src, src_mask, tgt = _random_batch(cfg, b=2, ltgt=6)
    enc = bart.encode(cfg, params, jnp.asarray(src[:2]), jnp.asarray(src_mask[:2]))
    full = bart.decode_full(cfg, params, enc, jnp.asarray(src_mask[:2]), jnp.asarray(tgt[:2]))

    cache = bart.empty_self_cache(cfg, 2, 8)
    cross_kv = bart.precompute_cross_kv(cfg, params, enc)
    enc_bias = bart.encoder_bias(jnp.asarray(src_mask[:2]))
    step_fn = jax.jit(
        lambda tok, i, c: bart.decode_step(cfg, params, tok, i, c, cross_kv, enc_bias)
    )
    for t in range(tgt.shape[1]):
        logits, cache = step_fn(jnp.asarray(tgt[:2, t]), jnp.int32(t), cache)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, t, :]), atol=2e-4, rtol=1e-4
        )


def test_cache_reorder(hf_pair):
    cfg, _, params = hf_pair
    cache = bart.empty_self_cache(cfg, 4, 5)
    cache[0]["k"] = cache[0]["k"].at[2].set(1.0)
    re = bart.reorder_cache(cache, jnp.array([2, 2, 0, 1]))
    assert float(re[0]["k"][0, 0, 0, 0]) == 1.0
    assert float(re[0]["k"][1, 0, 0, 0]) == 1.0
    assert float(re[0]["k"][2, 0, 0, 0]) == 0.0


def _fairseq_state_dict(cfg, params):
    """Assemble a fairseq-layout BART state dict from our own params
    (``decoder.embed_tokens`` one row short, reference ``utils.py:42-50``)."""
    sd = {}
    sd["decoder.embed_tokens.weight"] = np.asarray(params["shared"])[:-1]  # one short
    for side, cross in (("encoder", False), ("decoder", True)):
        sd[f"{side}.embed_positions.weight"] = np.asarray(params[side]["embed_positions"])
        sd[f"{side}.layernorm_embedding.weight"] = np.asarray(
            params[side]["layernorm_embedding"]["scale"]
        )
        sd[f"{side}.layernorm_embedding.bias"] = np.asarray(
            params[side]["layernorm_embedding"]["bias"]
        )
        for i, layer in enumerate(params[side]["layers"]):
            p = f"{side}.layers.{i}"
            for attn_name, attn_key in (("self_attn", "self_attn"),) + (
                (("encoder_attn", "cross_attn"),) if cross else ()
            ):
                for proj, key in (("q_proj", "q"), ("k_proj", "k"), ("v_proj", "v"), ("out_proj", "o")):
                    sd[f"{p}.{attn_name}.{proj}.weight"] = np.asarray(layer[attn_key][key]["kernel"]).T
                    sd[f"{p}.{attn_name}.{proj}.bias"] = np.asarray(layer[attn_key][key]["bias"])
            sd[f"{p}.self_attn_layer_norm.weight"] = np.asarray(layer["self_attn_ln"]["scale"])
            sd[f"{p}.self_attn_layer_norm.bias"] = np.asarray(layer["self_attn_ln"]["bias"])
            if cross:
                sd[f"{p}.encoder_attn_layer_norm.weight"] = np.asarray(layer["cross_attn_ln"]["scale"])
                sd[f"{p}.encoder_attn_layer_norm.bias"] = np.asarray(layer["cross_attn_ln"]["bias"])
            sd[f"{p}.fc1.weight"] = np.asarray(layer["fc1"]["kernel"]).T
            sd[f"{p}.fc1.bias"] = np.asarray(layer["fc1"]["bias"])
            sd[f"{p}.fc2.weight"] = np.asarray(layer["fc2"]["kernel"]).T
            sd[f"{p}.fc2.bias"] = np.asarray(layer["fc2"]["bias"])
            sd[f"{p}.final_layer_norm.weight"] = np.asarray(layer["final_ln"]["scale"])
            sd[f"{p}.final_layer_norm.bias"] = np.asarray(layer["final_ln"]["bias"])
    return sd


def test_fairseq_conversion_shape():
    """fairseq checkpoints are one embedding row short; converter pads."""
    cfg = bart_tiny(vocab_size=50)
    params = bart.init_params(jax.random.PRNGKey(0), cfg)
    sd = _fairseq_state_dict(cfg, params)
    conv = convert.from_fairseq_state_dict(sd, cfg)
    assert conv["shared"].shape == (cfg.vocab_size, cfg.d_model)
    np.testing.assert_array_equal(np.asarray(conv["shared"][-1]), 0.0)
    # converted params produce identical logits to the originals except for
    # the padded embedding row
    src = np.array([[3, 4, 5]]); mask = np.ones((1, 3), np.int64)
    tgt = np.array([[2, 3, 4]])
    params_t = dict(params); params_t["shared"] = conv["shared"]
    enc_a = bart.encode(cfg, params_t, jnp.asarray(src), jnp.asarray(mask))
    enc_b = bart.encode(cfg, conv, jnp.asarray(src), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(enc_a), np.asarray(enc_b), atol=1e-5)


def test_fairseq_checkpoint_file_roundtrip(tmp_path):
    """A GENUINE fairseq-pickled ``checkpoint_best.pt`` on disk -- torch
    tensors inside ``state['model']``, version keys, tied
    ``decoder.output_projection``, optimizer history -- must load through
    ``load_fairseq_checkpoint`` to the same params as the in-memory
    conversion (reference consumer: ``seal/utils.py:42-50``, selected by
    ``--fairseq_checkpoint``, ``retrieval.py:571-575``)."""
    import torch

    cfg = bart_tiny(vocab_size=50)
    params = bart.init_params(jax.random.PRNGKey(0), cfg)
    sd = {k: torch.tensor(v) for k, v in _fairseq_state_dict(cfg, params).items()}
    # fairseq artifacts the converter must tolerate/ignore
    sd["encoder.version"] = torch.tensor([2.0])
    sd["decoder.version"] = torch.tensor([2.0])
    sd["encoder.embed_tokens.weight"] = sd["decoder.embed_tokens.weight"]
    sd["decoder.output_projection.weight"] = sd["decoder.embed_tokens.weight"]
    state = {
        "args": None,
        "cfg": {"model": {"arch": "bart_large"}},
        "model": sd,
        "optimizer_history": [{"criterion_name": "LabelSmoothedCrossEntropyCriterion"}],
        "extra_state": {"train_iterator": {"epoch": 1}},
        "last_optimizer_state": {},
    }
    path = tmp_path / "checkpoint_best.pt"
    torch.save(state, str(path))

    loaded = convert.load_fairseq_checkpoint(str(path), cfg)
    direct = convert.from_fairseq_state_dict(_fairseq_state_dict(cfg, params), cfg)
    flat_a = jax.tree_util.tree_leaves(loaded)
    flat_b = jax.tree_util.tree_leaves(direct)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the loaded params actually run
    src = np.array([[3, 4, 5]])
    mask = np.ones((1, 3), np.int64)
    enc = bart.encode(cfg, loaded, jnp.asarray(src), jnp.asarray(mask))
    assert np.isfinite(np.asarray(enc)).all()


def test_apply_seal_logits_bias():
    import dataclasses

    # tiny/word-vocab configs default mask_token_id=None (no <mask> token);
    # pin one here to exercise the full reference hack
    cfg = dataclasses.replace(bart_tiny(vocab_size=50), mask_token_id=49)
    params = bart.init_params(jax.random.PRNGKey(0), cfg)
    params = convert.apply_seal_logits_bias(params, cfg)
    bias = np.asarray(params["final_logits_bias"])
    assert bias[cfg.pad_token_id] == -np.inf
    assert bias[cfg.bos_token_id] == -np.inf
    assert bias[cfg.mask_token_id] == -np.inf
    # None mask id: pad/bos still banned, nothing else touched
    cfg2 = bart_tiny(vocab_size=50)
    params2 = convert.apply_seal_logits_bias(
        bart.init_params(jax.random.PRNGKey(0), cfg2), cfg2
    )
    bias2 = np.asarray(params2["final_logits_bias"])
    assert bias2[cfg2.pad_token_id] == -np.inf
    assert np.isfinite(bias2[49])
    src = np.array([[3, 4, 5]]); mask = np.ones((1, 3), np.int64)
    enc = bart.encode(cfg, params, jnp.asarray(src), jnp.asarray(mask))
    logits = bart.decode_full(cfg, params, enc, jnp.asarray(mask), jnp.asarray([[2, 3]]))
    assert np.all(np.asarray(logits)[..., cfg.pad_token_id] == -np.inf)
