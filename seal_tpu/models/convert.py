"""Checkpoint converters: HF-torch / fairseq BART -> seal_tpu param pytree.

Replicates the reference's checkpoint surgery
(``/root/reference/seal/utils.py:42-50``): fairseq checkpoints tie the LM
head to ``decoder.embed_tokens`` and are one embedding row short of the HF
tokenizer's vocab, so a zero row is appended.  The ``final_logits_bias``
-inf hack for pad/bos/mask is applied by the searcher at load time
(``seal/retrieval.py:584-588``), mirrored in ``apply_seal_logits_bias``.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from seal_tpu.models.config import BartConfig

NEG_INF = float("-inf")


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _dense(sd: Mapping[str, Any], prefix: str) -> Dict[str, jnp.ndarray]:
    return {
        "kernel": jnp.asarray(_np(sd[prefix + ".weight"]).T),
        "bias": jnp.asarray(_np(sd[prefix + ".bias"])),
    }


def _ln(sd: Mapping[str, Any], prefix: str) -> Dict[str, jnp.ndarray]:
    return {
        "scale": jnp.asarray(_np(sd[prefix + ".weight"])),
        "bias": jnp.asarray(_np(sd[prefix + ".bias"])),
    }


def _attn(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {
        "q": _dense(sd, prefix + ".q_proj"),
        "k": _dense(sd, prefix + ".k_proj"),
        "v": _dense(sd, prefix + ".v_proj"),
        "o": _dense(sd, prefix + ".out_proj"),
    }


def _layer(sd: Mapping[str, Any], prefix: str, cross: bool) -> Dict[str, Any]:
    p = {
        "self_attn": _attn(sd, prefix + ".self_attn"),
        "self_attn_ln": _ln(sd, prefix + ".self_attn_layer_norm"),
        "fc1": _dense(sd, prefix + ".fc1"),
        "fc2": _dense(sd, prefix + ".fc2"),
        "final_ln": _ln(sd, prefix + ".final_layer_norm"),
    }
    if cross:
        p["cross_attn"] = _attn(sd, prefix + ".encoder_attn")
        p["cross_attn_ln"] = _ln(sd, prefix + ".encoder_attn_layer_norm")
    return p


def _stack(sd: Mapping[str, Any], prefix: str, n_layers: int, cross: bool) -> Dict[str, Any]:
    return {
        "embed_positions": jnp.asarray(_np(sd[prefix + ".embed_positions.weight"])),
        "layernorm_embedding": _ln(sd, prefix + ".layernorm_embedding"),
        "layers": [_layer(sd, f"{prefix}.layers.{i}", cross) for i in range(n_layers)],
    }


def from_hf_torch_state_dict(sd: Mapping[str, Any], cfg: BartConfig) -> Dict[str, Any]:
    """Convert a HF ``BartForConditionalGeneration.state_dict()``."""
    shared = jnp.asarray(_np(sd["model.shared.weight"]))
    if "final_logits_bias" in sd:
        bias = jnp.asarray(_np(sd["final_logits_bias"]).reshape(-1))
    else:
        bias = jnp.zeros((shared.shape[0],), jnp.float32)
    return {
        "shared": shared,
        "final_logits_bias": bias,
        "encoder": _stack(sd, "model.encoder", cfg.encoder_layers, cross=False),
        "decoder": _stack(sd, "model.decoder", cfg.decoder_layers, cross=True),
    }


def from_fairseq_state_dict(sd: Mapping[str, Any], cfg: BartConfig) -> Dict[str, Any]:
    """Convert a fairseq BART checkpoint's ``state['model']`` dict.

    Mirrors reference ``utils.py:42-50``: the shared embedding comes from
    ``decoder.embed_tokens.weight`` padded with one zero row (SEAL
    checkpoints are one row short of the HF tokenizer vocab); version keys
    and ``decoder.output_projection`` are ignored.
    """
    emb = _np(sd["decoder.embed_tokens.weight"])
    if emb.shape[0] < cfg.vocab_size:
        emb = np.concatenate(
            [emb, np.zeros((cfg.vocab_size - emb.shape[0], emb.shape[1]), emb.dtype)]
        )
    return {
        "shared": jnp.asarray(emb),
        "final_logits_bias": jnp.zeros((emb.shape[0],), jnp.float32),
        "encoder": _stack(sd, "encoder", cfg.encoder_layers, cross=False),
        "decoder": _stack(sd, "decoder", cfg.decoder_layers, cross=True),
    }


def load_fairseq_checkpoint(path: str, cfg: BartConfig) -> Dict[str, Any]:
    """Load a fairseq ``checkpoint_best.pt`` (requires torch, CPU only)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    return from_fairseq_state_dict(state["model"], cfg)


def load_hf_checkpoint(path_or_model, cfg: BartConfig) -> Dict[str, Any]:
    """Load from a HF model object, a ``pytorch_model.bin`` path, or a HF dir."""
    if hasattr(path_or_model, "state_dict"):
        return from_hf_torch_state_dict(path_or_model.state_dict(), cfg)
    import os

    import torch

    path = path_or_model
    if os.path.isdir(path):
        path = os.path.join(path, "pytorch_model.bin")
    sd = torch.load(path, map_location="cpu", weights_only=False)
    return from_hf_torch_state_dict(sd, cfg)


# Parity alias: reference ``load_state_dict_from_lightning_checkpoint``
# (``seal/utils.py:31-39``) loads a plain HF-layout torch state dict.
load_lightning_checkpoint = load_hf_checkpoint


def _t5_attn(sd, prefix):
    return {k: jnp.asarray(_np(sd[f"{prefix}.{k}.weight"]).T) for k in ("q", "k", "v", "o")}


def _t5_ffn(sd, prefix, gated: bool):
    p = {"wo": jnp.asarray(_np(sd[prefix + ".wo.weight"]).T)}
    if gated:
        p["wi_0"] = jnp.asarray(_np(sd[prefix + ".wi_0.weight"]).T)
        p["wi_1"] = jnp.asarray(_np(sd[prefix + ".wi_1.weight"]).T)
    else:
        p["wi"] = jnp.asarray(_np(sd[prefix + ".wi.weight"]).T)
    return p


def from_hf_t5_state_dict(sd: Mapping[str, Any], cfg) -> Dict[str, Any]:
    """Convert a HF ``T5ForConditionalGeneration.state_dict()`` to the
    seal_tpu T5 param pytree."""
    gated = cfg.feed_forward_proj == "gated-gelu"

    def stack(side: str, cross: bool):
        layers = []
        for i in range(cfg.num_layers):
            b = f"{side}.block.{i}.layer"
            p = {
                "self_attn": _t5_attn(sd, f"{b}.0.SelfAttention"),
                "ln_self": jnp.asarray(_np(sd[f"{b}.0.layer_norm.weight"])),
            }
            if cross:
                p["cross_attn"] = _t5_attn(sd, f"{b}.1.EncDecAttention")
                p["ln_cross"] = jnp.asarray(_np(sd[f"{b}.1.layer_norm.weight"]))
                ffn_idx = 2
            else:
                ffn_idx = 1
            p["ffn"] = _t5_ffn(sd, f"{b}.{ffn_idx}.DenseReluDense", gated)
            p["ln_ffn"] = jnp.asarray(_np(sd[f"{b}.{ffn_idx}.layer_norm.weight"]))
            layers.append(p)
        return {
            "rel_bias": jnp.asarray(
                _np(sd[f"{side}.block.0.layer.0.SelfAttention.relative_attention_bias.weight"])
            ),
            "layers": layers,
            "final_ln": jnp.asarray(_np(sd[f"{side}.final_layer_norm.weight"])),
        }

    return {
        "shared": jnp.asarray(_np(sd["shared.weight"])),
        "encoder": stack("encoder", cross=False),
        "decoder": stack("decoder", cross=True),
    }


def apply_seal_logits_bias(params: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Set final_logits_bias of pad/bos/mask to -inf (reference
    ``retrieval.py:584-588``).  BART-specific, like the reference's
    ``hasattr(model, 'final_logits_bias')`` guard -- a no-op for T5."""
    if "final_logits_bias" not in params:
        return params
    bias = np.asarray(params["final_logits_bias"]).copy()
    for tok in (cfg.pad_token_id, cfg.bos_token_id, cfg.mask_token_id):
        if tok is not None and tok < bias.shape[0]:
            bias[tok] = NEG_INF
    out = dict(params)
    out["final_logits_bias"] = jnp.asarray(bias)
    return out
