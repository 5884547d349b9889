"""Device mesh + sharding specs.

The reference is a single-GPU stack with CPU-side parallelism (SURVEY.md
section 2); here parallelism is first-class:

* ``data``  axis: queries/batch (DP) -- also used to shard the FM-index by
  corpus shards in ``sharded_index.py``;
* ``model`` axis: tensor parallelism over attention heads / FFN hidden dim.

``param_pspecs`` maps the BART param pytree to ``PartitionSpec`` trees:
QKV/fc1 shard their output dim, out-proj/fc2 shard their input dim (the
Megatron layout -- one all-reduce per block, inserted automatically by XLA
from the shardings).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (n_data, n_model, len(devices))
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def _attn_pspecs(tp: bool):
    col = P(None, "model") if tp else P()  # output-dim sharded
    row = P("model", None) if tp else P()  # input-dim sharded
    vec = P("model") if tp else P()
    return {
        "q": {"kernel": col, "bias": vec},
        "k": {"kernel": col, "bias": vec},
        "v": {"kernel": col, "bias": vec},
        "o": {"kernel": row, "bias": P()},
    }


def _layer_pspecs(cross: bool, tp: bool):
    p = {
        "self_attn": _attn_pspecs(tp),
        "self_attn_ln": {"scale": P(), "bias": P()},
        "fc1": {"kernel": P(None, "model") if tp else P(), "bias": P("model") if tp else P()},
        "fc2": {"kernel": P("model", None) if tp else P(), "bias": P()},
        "final_ln": {"scale": P(), "bias": P()},
    }
    if cross:
        p["cross_attn"] = _attn_pspecs(tp)
        p["cross_attn_ln"] = {"scale": P(), "bias": P()}
    return p


def param_pspecs(cfg, tensor_parallel: bool = True) -> Any:
    """PartitionSpec pytree matching ``bart.init_params`` output."""
    tp = tensor_parallel
    return {
        "shared": P(),  # embeddings replicated (vocab gathers are cheap)
        "final_logits_bias": P(),
        "encoder": {
            "embed_positions": P(),
            "layernorm_embedding": {"scale": P(), "bias": P()},
            "layers": [_layer_pspecs(False, tp) for _ in range(cfg.encoder_layers)],
        },
        "decoder": {
            "embed_positions": P(),
            "layernorm_embedding": {"scale": P(), "bias": P()},
            "layers": [_layer_pspecs(True, tp) for _ in range(cfg.decoder_layers)],
        },
    }


def shard_params(params, mesh: Mesh, cfg, tensor_parallel: bool = True):
    """Place a param pytree onto the mesh according to ``param_pspecs``."""
    specs = param_pspecs(cfg, tensor_parallel)
    return jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), params, specs
    )


def data_pspec() -> P:
    return P("data")


def replicated_pspec() -> P:
    return P()
