"""BART encoder-decoder in pure-functional JAX.

A from-scratch implementation (not a port of HF ``modeling_bart``) designed
for TPU decoding:

* params are a plain nested dict pytree -> trivial to shard with pjit
  (tensor-parallel specs in ``seal_tpu.parallel``);
* the decoder KV cache is an explicit pytree threaded through
  ``decode_step`` so the whole beam-search loop can live inside one
  ``lax.scan`` (the reference reorders HF's opaque ``past`` cache on host,
  ``seal/beam_search.py:328-332``);
* weights are tied (lm head = shared embedding transposed) with a
  ``final_logits_bias`` row, matching the checkpoint format the reference
  loads (``seal/utils.py:42-50``, ``seal/retrieval.py:584-588``).

Semantics match HF BART: learned positions with a +2 offset, post-layernorm
blocks, exact (erf) GELU, layernorm on embeddings.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from seal_tpu.models.config import BartConfig

Params = Dict[str, Any]

NEG_INF = -1e9


# ----------------------------------------------------------------- init utils


def _dense_init(rng, d_in, d_out, scale=0.02):
    w_rng, _ = jax.random.split(rng)
    return {
        "kernel": (jax.random.normal(w_rng, (d_in, d_out)) * scale).astype(jnp.float32),
        "bias": jnp.zeros((d_out,), jnp.float32),
    }


def _ln_init(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def _attn_init(rng, d_model):
    rngs = jax.random.split(rng, 4)
    return {
        "q": _dense_init(rngs[0], d_model, d_model),
        "k": _dense_init(rngs[1], d_model, d_model),
        "v": _dense_init(rngs[2], d_model, d_model),
        "o": _dense_init(rngs[3], d_model, d_model),
    }


def _layer_init(rng, cfg: BartConfig, cross: bool):
    n = 6 if cross else 4
    rngs = jax.random.split(rng, n)
    # cross=True marks a decoder layer: its FFN width is decoder_ffn_dim
    # (equal to encoder_ffn_dim on the stock configs, but asymmetric
    # configs must not silently get encoder-width decoder FFNs)
    ffn = cfg.decoder_ffn_dim if cross else cfg.encoder_ffn_dim
    p = {
        "self_attn": _attn_init(rngs[0], cfg.d_model),
        "self_attn_ln": _ln_init(cfg.d_model),
        "fc1": _dense_init(rngs[1], cfg.d_model, ffn),
        "fc2": _dense_init(rngs[2], ffn, cfg.d_model),
        "final_ln": _ln_init(cfg.d_model),
    }
    if cross:
        p["cross_attn"] = _attn_init(rngs[3], cfg.d_model)
        p["cross_attn_ln"] = _ln_init(cfg.d_model)
    return p


def init_params(rng, cfg: BartConfig) -> Params:
    rngs = jax.random.split(rng, 4 + cfg.encoder_layers + cfg.decoder_layers)
    params: Params = {
        "shared": (jax.random.normal(rngs[0], (cfg.vocab_size, cfg.d_model)) * 0.02).astype(
            jnp.float32
        ),
        "final_logits_bias": jnp.zeros((cfg.vocab_size,), jnp.float32),
        "encoder": {
            "embed_positions": (
                jax.random.normal(
                    rngs[1], (cfg.max_position_embeddings + cfg.position_offset, cfg.d_model)
                )
                * 0.02
            ).astype(jnp.float32),
            "layernorm_embedding": _ln_init(cfg.d_model),
            "layers": [
                _layer_init(rngs[4 + i], cfg, cross=False) for i in range(cfg.encoder_layers)
            ],
        },
        "decoder": {
            "embed_positions": (
                jax.random.normal(
                    rngs[2], (cfg.max_position_embeddings + cfg.position_offset, cfg.d_model)
                )
                * 0.02
            ).astype(jnp.float32),
            "layernorm_embedding": _ln_init(cfg.d_model),
            "layers": [
                _layer_init(rngs[4 + cfg.encoder_layers + i], cfg, cross=True)
                for i in range(cfg.decoder_layers)
            ],
        },
    }
    return params


# ------------------------------------------------------------------- building


def _ln(p, x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    y = (x32 - mu) * lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _dense(p, x):
    return (x @ p["kernel"].astype(x.dtype)) + p["bias"].astype(x.dtype)


def _split_heads(x, n_heads):
    b, l, d = x.shape
    return x.reshape(b, l, n_heads, d // n_heads)


def _merge_heads(x):
    b, l, h, dh = x.shape
    return x.reshape(b, l, h * dh)


def _attention(p, x_q, kv, bias, n_heads, dtype):
    """Multi-head attention. kv: (k, v) already projected+split, or None to
    project from x_q (self-attention without cache)."""
    q = _split_heads(_dense(p["q"], x_q) * (1.0 / np.sqrt(x_q.shape[-1] // n_heads)), n_heads)
    k, v = kv
    # [b, h, lq, lk]
    scores = jnp.einsum("blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dtype)
    out = jnp.einsum("bhlm,bmhd->blhd", probs, v)
    return _dense(p["o"], _merge_heads(out))


def _cross_attention_step(p, x_q, kv, bias, n_heads, dtype):
    """Cross-attention for the single-token decode step with PER-QUERY K/V.

    Beam search tiles the decoder rows ``[Bq*K, 1, d]`` but every beam of a
    query attends to the SAME encoder state, so K/V stay ``[Bq, M, H, Dh]``
    and the beam axis becomes the query-length axis of one grouped
    attention -- the K/V tensors (the dominant per-step HBM read: 330 MB/
    step beam-tiled at the bench shape, 1.4 GB/step at beam 32 x batch 64)
    are streamed once per QUERY instead of once per beam.  Falls back to
    the plain path when shapes already match (rescoring, encoders, tests).
    """
    k, v = kv
    bq, b = k.shape[0], x_q.shape[0]
    if bq == b:
        return _attention(p, x_q, kv, bias, n_heads, dtype)
    g = b // bq
    q = _split_heads(
        _dense(p["q"], x_q) * (1.0 / np.sqrt(x_q.shape[-1] // n_heads)), n_heads
    )  # [b, 1, H, Dh]
    qg = q[:, 0].reshape(bq, g, n_heads, q.shape[-1])
    scores = jnp.einsum("bghd,bmhd->bghm", qg, k, preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias  # [Bq,1,1,M] broadcasts over (g, H)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dtype)
    out = jnp.einsum("bghm,bmhd->bghd", probs, v)
    out = out.reshape(b, 1, n_heads, q.shape[-1])
    return _dense(p["o"], _merge_heads(out))


def _project_kv(p, x, n_heads):
    return _split_heads(_dense(p["k"], x), n_heads), _split_heads(_dense(p["v"], x), n_heads)


def _ffn(p, x):
    h = jax.nn.gelu(_dense(p["fc1"], x), approximate=False)
    return _dense(p["fc2"], h)


def _padding_bias(mask):
    """[B, L] 1/0 mask -> additive [B, 1, 1, L] bias."""
    return jnp.where(mask[:, None, None, :] > 0, 0.0, NEG_INF).astype(jnp.float32)


# -------------------------------------------------------------------- encoder


def _embed(cfg: BartConfig, table, pos_table, ids, ln, positions):
    scale = np.sqrt(cfg.d_model) if cfg.scale_embedding else 1.0
    x = table[ids].astype(cfg.compute_dtype) * scale
    x = x + pos_table[positions + cfg.position_offset].astype(cfg.compute_dtype)
    return _ln(ln, x)


def encode(cfg: BartConfig, params: Params, input_ids, attention_mask):
    """Encoder forward.  input_ids/attention_mask: int [B, L]."""
    enc = params["encoder"]
    b, l = input_ids.shape
    positions = jnp.arange(l)[None, :]
    x = _embed(cfg, params["shared"], enc["embed_positions"], input_ids,
               enc["layernorm_embedding"], positions)
    bias = _padding_bias(attention_mask)
    n_heads = cfg.encoder_attention_heads

    def layer_fwd(x, p):
        kv = _project_kv(p["self_attn"], x, n_heads)
        h = _attention(p["self_attn"], x, kv, bias, n_heads, cfg.compute_dtype)
        x = _ln(p["self_attn_ln"], x + h)
        h = _ffn(p, x)
        x = _ln(p["final_ln"], x + h)
        return x

    if cfg.remat:
        layer_fwd = jax.checkpoint(layer_fwd)
    for p in enc["layers"]:
        x = layer_fwd(x, p)
    return x


# -------------------------------------------------------------------- decoder


def encoder_bias(enc_mask):
    """Additive cross-attention bias from the encoder padding mask."""
    return _padding_bias(enc_mask)


def precompute_cross_kv(cfg: BartConfig, params: Params, enc_out):
    """Cross-attention K/V projected once per query (the main FLOP saver for
    short constrained decodes)."""
    return [
        _project_kv(p["cross_attn"], enc_out, cfg.decoder_attention_heads)
        for p in params["decoder"]["layers"]
    ]


def empty_self_cache(cfg: BartConfig, batch: int, max_len: int):
    h, dh = cfg.decoder_attention_heads, cfg.head_dim
    z = lambda: jnp.zeros((batch, max_len, h, dh), cfg.compute_dtype)
    return [{"k": z(), "v": z()} for _ in range(cfg.decoder_layers)]


def decode_step(
    cfg: BartConfig,
    params: Params,
    token_ids,  # int [B] tokens at current position
    step,  # scalar int32: current position (0-based)
    self_cache,  # from empty_self_cache
    cross_kv,  # from precompute_cross_kv
    enc_bias,  # from _padding_bias(enc_mask) -- [B,1,1,Lsrc]
):
    """One incremental decoder step; returns (logits [B, V], new self_cache)."""
    dec = params["decoder"]
    n_heads = cfg.decoder_attention_heads
    b = token_ids.shape[0]
    max_len = self_cache[0]["k"].shape[1]
    positions = jnp.full((b, 1), step, jnp.int32)
    x = _embed(cfg, params["shared"], dec["embed_positions"], token_ids[:, None],
               dec["layernorm_embedding"], positions)

    # causal visibility of cached slots: [1,1,1,max_len]
    slot_ids = jnp.arange(max_len)
    self_bias = jnp.where(slot_ids[None, None, None, :] <= step, 0.0, NEG_INF)

    new_cache = []
    for p, sc, ckv in zip(dec["layers"], self_cache, cross_kv):
        k_new, v_new = _project_kv(p["self_attn"], x, n_heads)  # [B,1,H,Dh]
        k = lax.dynamic_update_slice_in_dim(sc["k"], k_new.astype(sc["k"].dtype), step, axis=1)
        v = lax.dynamic_update_slice_in_dim(sc["v"], v_new.astype(sc["v"].dtype), step, axis=1)
        new_cache.append({"k": k, "v": v})
        h = _attention(p["self_attn"], x, (k, v), self_bias, n_heads, cfg.compute_dtype)
        x = _ln(p["self_attn_ln"], x + h)
        h = _cross_attention_step(
            p["cross_attn"], x, ckv, enc_bias, n_heads, cfg.compute_dtype
        )
        x = _ln(p["cross_attn_ln"], x + h)
        h = _ffn(p, x)
        x = _ln(p["final_ln"], x + h)

    logits = lm_logits(cfg, params, x[:, 0, :])
    return logits, new_cache


def decode_full(cfg: BartConfig, params: Params, enc_out, enc_mask, decoder_input_ids,
                decoder_mask=None):
    """Teacher-forced decoder forward: logits [B, L, V].

    Used by key rescoring (reference ``seal/keys.py:64-141``) and training.
    """
    dec = params["decoder"]
    n_heads = cfg.decoder_attention_heads
    b, l = decoder_input_ids.shape
    positions = jnp.arange(l)[None, :]
    x = _embed(cfg, params["shared"], dec["embed_positions"], decoder_input_ids,
               dec["layernorm_embedding"], positions)

    causal = jnp.where(
        jnp.arange(l)[None, None, :, None] >= jnp.arange(l)[None, None, None, :], 0.0, NEG_INF
    )  # [1,1,L(query),L(key)]
    if decoder_mask is not None:
        causal = causal + _padding_bias(decoder_mask)
    enc_bias = _padding_bias(enc_mask)
    cross_kv = precompute_cross_kv(cfg, params, enc_out)

    def layer_fwd(x, p, ckv):
        kv = _project_kv(p["self_attn"], x, n_heads)
        h = _attention(p["self_attn"], x, kv, causal, n_heads, cfg.compute_dtype)
        x = _ln(p["self_attn_ln"], x + h)
        h = _attention(p["cross_attn"], x, ckv, enc_bias, n_heads, cfg.compute_dtype)
        x = _ln(p["cross_attn_ln"], x + h)
        h = _ffn(p, x)
        x = _ln(p["final_ln"], x + h)
        return x

    if cfg.remat:
        layer_fwd = jax.checkpoint(layer_fwd)
    for p, ckv in zip(dec["layers"], cross_kv):
        x = layer_fwd(x, p, ckv)
    return lm_logits(cfg, params, x)


def lm_logits(cfg: BartConfig, params: Params, hidden):
    """Tied LM head: hidden @ shared.T + final_logits_bias.

    Runs in the compute dtype with float32 accumulation: bit-identical to
    the old explicit float32 upcast for float32 configs, while bfloat16
    serving keeps the [V, d] table -- the single largest weight read of
    every decode step -- in 16-bit HBM traffic and on the MXU's fast path.
    """
    dt = cfg.compute_dtype
    logits = jnp.matmul(
        hidden.astype(dt),
        params["shared"].astype(dt).T,
        preferred_element_type=jnp.float32,
    )
    return logits + params["final_logits_bias"]


# ---------------------------------------------------------------- conveniences


def reorder_cache(self_cache, beam_idx):
    """Gather cache rows along batch dim after a beam permutation."""
    return jax.tree_util.tree_map(lambda a: a[beam_idx], self_cache)


def count_params(params: Params) -> int:
    return sum(int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(params))
