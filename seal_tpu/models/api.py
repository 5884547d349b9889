"""Model-family dispatch: BART and T5 share one functional interface
(init_params / encode / decode_full / decode_step / caches), selected by the
config type so the fused decoder and scorers are family-agnostic."""

from __future__ import annotations

from seal_tpu.models import bart as _bart
from seal_tpu.models import t5 as _t5
from seal_tpu.models.config import BartConfig
from seal_tpu.models.t5 import T5Config


def module_for(cfg):
    if isinstance(cfg, T5Config) or getattr(cfg, "family", "bart") == "t5":
        return _t5
    if isinstance(cfg, BartConfig):
        return _bart
    raise TypeError(f"unknown model config type: {type(cfg)!r}")


def cast_params(cfg, params):
    """Materialize a compute-dtype copy of the weight matrices for serving.

    Masters are float32 (training, checkpoint I/O), but the decoder streams
    every weight matrix from HBM once per step, so serving a bfloat16 config
    from float32 masters pays double the weight bandwidth of the whole decode
    scan.  Casting once up front halves that traffic and the resident
    footprint.  Family-agnostic rule: floating leaves with >= 2 dims (weight
    matrices, embedding tables) go to ``cfg.compute_dtype``; 1-D leaves
    (biases, LayerNorm/RMSNorm scales, ``final_logits_bias``) stay float32 --
    they are O(d) and the norms consume them in float32 anyway.

    No-op for float32 configs, so call sites need no dtype branch.
    """
    import jax
    import jax.numpy as jnp

    dt = cfg.compute_dtype
    if dt == jnp.float32:
        return params

    def leaf(x):
        x = jnp.asarray(x)
        if x.ndim >= 2 and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dt)
        return x

    return jax.tree_util.tree_map(leaf, params)
