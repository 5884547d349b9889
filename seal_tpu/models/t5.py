"""T5 encoder-decoder in pure-functional JAX.

Second backbone family (the reference supports ``t5`` backbones through HF
``AutoModelForSeq2SeqLM`` and dedicated token constants,
``/root/reference/seal/retrieval.py:494-504``).  Same interface as
``bart.py`` -- ``init_params`` / ``encode`` / ``decode_full`` /
``decode_step`` / caches -- so the fused constrained decoder is
family-agnostic.

Faithful T5 semantics: RMSNorm pre-norm blocks, bucketed relative position
bias (computed once per stack, added to every layer's attention scores),
un-scaled dot-product attention, bias-free linears, relu or gated-gelu FFN,
tied embeddings with the d_model^-0.5 logit scaling.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = Dict[str, Any]
NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64
    d_ff: int = 3072
    num_layers: int = 12  # encoder == decoder depth
    num_heads: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    feed_forward_proj: str = "relu"  # or "gated-gelu" (t5 v1.1)
    pad_token_id: int = 0
    eos_token_id: int = 1
    bos_token_id: int = 0  # T5 has no BOS; pad doubles as decoder start
    decoder_start_token_id: int = 0
    mask_token_id: Optional[int] = None
    forced_bos_token_id: Optional[int] = None
    tie_word_embeddings: bool = True
    dtype: str = "float32"
    remat: bool = False
    family: str = "t5"

    # interface parity with BartConfig
    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @property
    def encoder_layers(self):
        return self.num_layers

    @property
    def decoder_layers(self):
        return self.num_layers

    @property
    def decoder_attention_heads(self):
        return self.num_heads

    @property
    def head_dim(self):
        return self.d_kv

    @property
    def max_position_embeddings(self):
        return 512


def t5_tiny(vocab_size: int = 128) -> T5Config:
    return T5Config(
        vocab_size=vocab_size, d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4
    )


# ----------------------------------------------------------------- init


def _lin(rng, d_in, d_out, scale=0.05):
    return (jax.random.normal(rng, (d_in, d_out)) * scale).astype(jnp.float32)


def _attn_init(rng, cfg: T5Config):
    r = jax.random.split(rng, 4)
    inner = cfg.num_heads * cfg.d_kv
    return {
        "q": _lin(r[0], cfg.d_model, inner),
        "k": _lin(r[1], cfg.d_model, inner),
        "v": _lin(r[2], cfg.d_model, inner),
        "o": _lin(r[3], inner, cfg.d_model),
    }


def _ffn_init(rng, cfg: T5Config):
    r = jax.random.split(rng, 3)
    p = {"wo": _lin(r[2], cfg.d_ff, cfg.d_model)}
    if cfg.feed_forward_proj == "gated-gelu":
        p["wi_0"] = _lin(r[0], cfg.d_model, cfg.d_ff)
        p["wi_1"] = _lin(r[1], cfg.d_model, cfg.d_ff)
    else:
        p["wi"] = _lin(r[0], cfg.d_model, cfg.d_ff)
    return p


def _layer_init(rng, cfg: T5Config, cross: bool):
    r = jax.random.split(rng, 3)
    p = {
        "self_attn": _attn_init(r[0], cfg),
        "ln_self": jnp.ones((cfg.d_model,), jnp.float32),
        "ffn": _ffn_init(r[1], cfg),
        "ln_ffn": jnp.ones((cfg.d_model,), jnp.float32),
    }
    if cross:
        p["cross_attn"] = _attn_init(r[2], cfg)
        p["ln_cross"] = jnp.ones((cfg.d_model,), jnp.float32)
    return p


def init_params(rng, cfg: T5Config) -> Params:
    n = cfg.num_layers
    rngs = jax.random.split(rng, 2 * n + 3)
    return {
        "shared": (jax.random.normal(rngs[0], (cfg.vocab_size, cfg.d_model)) * 1.0).astype(
            jnp.float32
        ),
        "encoder": {
            "rel_bias": _lin(rngs[1], cfg.relative_attention_num_buckets, cfg.num_heads, 0.05),
            "layers": [_layer_init(rngs[3 + i], cfg, cross=False) for i in range(n)],
            "final_ln": jnp.ones((cfg.d_model,), jnp.float32),
        },
        "decoder": {
            "rel_bias": _lin(rngs[2], cfg.relative_attention_num_buckets, cfg.num_heads, 0.05),
            "layers": [_layer_init(rngs[3 + n + i], cfg, cross=True) for i in range(n)],
            "final_ln": jnp.ones((cfg.d_model,), jnp.float32),
        },
    }


# ----------------------------------------------------------------- building


def _rms(scale, x, eps=1e-6):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * lax.rsqrt(var + eps) * scale).astype(x.dtype)


def _split(x, h, dk):
    b, l, _ = x.shape
    return x.reshape(b, l, h, dk)


def _merge(x):
    b, l, h, dk = x.shape
    return x.reshape(b, l, h * dk)


def _relative_bucket(rel, bidirectional, num_buckets, max_distance):
    """HF T5 ``_relative_position_bucket`` semantics; ``rel`` here is
    memory_position - context_position."""
    ret = jnp.zeros_like(rel)
    n = rel
    if bidirectional:
        num_buckets //= 2
        ret = ret + jnp.where(n > 0, num_buckets, 0)
        n = jnp.abs(n)
    else:
        n = -jnp.minimum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


def _position_bias(cfg: T5Config, table, q_pos, k_pos, bidirectional):
    """[1, H, Lq, Lk] additive attention bias from the bucket table."""
    rel = k_pos[None, :] - q_pos[:, None]  # memory - context (HF convention)
    bucket = _relative_bucket(
        rel,
        bidirectional,
        cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance,
    )
    bias = table[bucket]  # [Lq, Lk, H]
    return jnp.transpose(bias, (2, 0, 1))[None].astype(jnp.float32)


def _attention(p, x_q, kv, bias, h, dk, dtype):
    q = _split(x_q @ p["q"].astype(x_q.dtype), h, dk)  # NOTE: no 1/sqrt(dk)
    k, v = kv
    scores = jnp.einsum("blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
    out = jnp.einsum("bhlm,bmhd->blhd", probs, v)
    return _merge(out) @ p["o"].astype(dtype)


def _cross_attention_step(p, x_q, kv, bias, h, dk, dtype):
    """Single-token cross-attention with PER-QUERY K/V under beam tiling:
    query rows [Bq*K, 1, d] attend grouped against K/V [Bq, M, H, Dh], so
    the encoder K/V stream once per query, not once per beam (see
    bart._cross_attention_step).  T5 cross-attention carries no relative
    position bias (only the padding bias, [Bq,1,1,M]), so the broadcast
    over (group, head) is exact."""
    k, v = kv
    bq, b = k.shape[0], x_q.shape[0]
    if bq == b:
        return _attention(p, x_q, kv, bias, h, dk, dtype)
    g = b // bq
    q = _split(x_q @ p["q"].astype(x_q.dtype), h, dk)  # [b, 1, H, Dh]
    qg = q[:, 0].reshape(bq, g, h, dk)
    scores = jnp.einsum("bghd,bmhd->bghm", qg, k, preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias  # [Bq,1,1,M] broadcasts over (g, H)
    probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
    out = jnp.einsum("bghm,bmhd->bghd", probs, v)
    out = out.reshape(b, 1, h, dk)
    return _merge(out) @ p["o"].astype(dtype)


def _project_kv(p, x, h, dk):
    return _split(x @ p["k"].astype(x.dtype), h, dk), _split(x @ p["v"].astype(x.dtype), h, dk)


def _ffn(cfg: T5Config, p, x):
    if cfg.feed_forward_proj == "gated-gelu":
        hidden = jax.nn.gelu(x @ p["wi_0"].astype(x.dtype), approximate=True) * (
            x @ p["wi_1"].astype(x.dtype)
        )
    else:
        hidden = jax.nn.relu(x @ p["wi"].astype(x.dtype))
    return hidden @ p["wo"].astype(x.dtype)


def _padding_bias(mask):
    return jnp.where(mask[:, None, None, :] > 0, 0.0, NEG_INF).astype(jnp.float32)


def encoder_bias(mask):
    return _padding_bias(mask)


def encode(cfg: T5Config, params: Params, input_ids, attention_mask):
    enc = params["encoder"]
    h, dk = cfg.num_heads, cfg.d_kv
    x = params["shared"][input_ids].astype(cfg.compute_dtype)
    l = input_ids.shape[1]
    pos = jnp.arange(l)
    bias = _position_bias(cfg, enc["rel_bias"], pos, pos, bidirectional=True)
    bias = bias + _padding_bias(attention_mask)

    def layer_fwd(x, p):
        y = _rms(p["ln_self"], x)
        kv = _project_kv(p["self_attn"], y, h, dk)
        x = x + _attention(p["self_attn"], y, kv, bias, h, dk, cfg.compute_dtype)
        y = _rms(p["ln_ffn"], x)
        x = x + _ffn(cfg, p["ffn"], y)
        return x

    if cfg.remat:
        layer_fwd = jax.checkpoint(layer_fwd)
    for p in enc["layers"]:
        x = layer_fwd(x, p)
    return _rms(enc["final_ln"], x)


def precompute_cross_kv(cfg: T5Config, params: Params, enc_out):
    h, dk = cfg.num_heads, cfg.d_kv
    return [
        _project_kv(p["cross_attn"], enc_out, h, dk)
        for p in params["decoder"]["layers"]
    ]


def empty_self_cache(cfg: T5Config, batch: int, max_len: int):
    h, dk = cfg.num_heads, cfg.d_kv
    z = lambda: jnp.zeros((batch, max_len, h, dk), cfg.compute_dtype)
    return [{"k": z(), "v": z()} for _ in range(cfg.num_layers)]


def lm_logits(cfg: T5Config, params: Params, hidden):
    # compute-dtype matmul, float32 accumulation (see bart.lm_logits)
    if cfg.tie_word_embeddings:
        hidden = hidden * (cfg.d_model ** -0.5)
    dt = cfg.compute_dtype
    logits = jnp.matmul(
        hidden.astype(dt),
        params["shared"].astype(dt).T,
        preferred_element_type=jnp.float32,
    )
    # optional additive bias, mirroring BART's final_logits_bias: HF T5 has
    # no such param (absent -> bit-identical to before), but converters and
    # benchmarks use it for the same -inf masking / workload-shaping hacks
    # the reference applies to BART (reference scripts patch the bias at
    # conversion time; see models/convert.py)
    bias = params.get("final_logits_bias")
    if bias is not None:
        logits = logits + bias
    return logits


def decode_full(cfg: T5Config, params: Params, enc_out, enc_mask, decoder_input_ids,
                decoder_mask=None):
    dec = params["decoder"]
    h, dk = cfg.num_heads, cfg.d_kv
    l = decoder_input_ids.shape[1]
    x = params["shared"][decoder_input_ids].astype(cfg.compute_dtype)
    pos = jnp.arange(l)
    bias = _position_bias(cfg, dec["rel_bias"], pos, pos, bidirectional=False)
    causal = jnp.where(pos[None, None, :, None] >= pos[None, None, None, :], 0.0, NEG_INF)
    bias = bias + causal
    if decoder_mask is not None:
        bias = bias + _padding_bias(decoder_mask)
    e_bias = _padding_bias(enc_mask)
    cross_kv = precompute_cross_kv(cfg, params, enc_out)

    def layer_fwd(x, p, ckv):
        y = _rms(p["ln_self"], x)
        kv = _project_kv(p["self_attn"], y, h, dk)
        x = x + _attention(p["self_attn"], y, kv, bias, h, dk, cfg.compute_dtype)
        y = _rms(p["ln_cross"], x)
        x = x + _attention(p["cross_attn"], y, ckv, e_bias, h, dk, cfg.compute_dtype)
        y = _rms(p["ln_ffn"], x)
        x = x + _ffn(cfg, p["ffn"], y)
        return x

    if cfg.remat:
        layer_fwd = jax.checkpoint(layer_fwd)
    for p, ckv in zip(dec["layers"], cross_kv):
        x = layer_fwd(x, p, ckv)
    x = _rms(dec["final_ln"], x)
    return lm_logits(cfg, params, x)


def decode_step(cfg: T5Config, params: Params, token_ids, step, self_cache, cross_kv,
                enc_bias):
    dec = params["decoder"]
    h, dk = cfg.num_heads, cfg.d_kv
    b = token_ids.shape[0]
    max_len = self_cache[0]["k"].shape[1]
    x = params["shared"][token_ids[:, None]].astype(cfg.compute_dtype)

    slot = jnp.arange(max_len)
    rel_bias = _position_bias(
        cfg, dec["rel_bias"], jnp.full((1,), step), slot, bidirectional=False
    )  # [1, H, 1, max_len]
    visib = jnp.where(slot[None, None, None, :] <= step, 0.0, NEG_INF)
    bias = rel_bias + visib

    new_cache = []
    for p, sc, ckv in zip(dec["layers"], self_cache, cross_kv):
        y = _rms(p["ln_self"], x)
        k_new, v_new = _project_kv(p["self_attn"], y, h, dk)
        k = lax.dynamic_update_slice_in_dim(sc["k"], k_new.astype(sc["k"].dtype), step, axis=1)
        v = lax.dynamic_update_slice_in_dim(sc["v"], v_new.astype(sc["v"].dtype), step, axis=1)
        new_cache.append({"k": k, "v": v})
        x = x + _attention(p["self_attn"], y, (k, v), bias, h, dk, cfg.compute_dtype)
        y = _rms(p["ln_cross"], x)
        x = x + _cross_attention_step(
            p["cross_attn"], y, ckv, enc_bias, h, dk, cfg.compute_dtype
        )
        y = _rms(p["ln_ffn"], x)
        x = x + _ffn(cfg, p["ffn"], y)
    x = _rms(dec["final_ln"], x)
    return lm_logits(cfg, params, x[:, 0, :]), new_cache


def reorder_cache(self_cache, beam_idx):
    return jax.tree_util.tree_map(lambda a: a[beam_idx], self_cache)
