"""Seq2seq trainer: label-smoothed cross-entropy + AdamW under pjit.

The reference delegates training to fairseq (``training_fairseq.sh:14-50``:
BART-large, label_smoothed_cross_entropy 0.1, lr 3e-5 polynomial decay,
warmup 500, fp16).  This module provides the native equivalent: the same
objective and schedule, jitted over a (data, model) mesh with DP gradients
``psum``-reduced by XLA from the shardings.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from seal_tpu.models import bart
from seal_tpu.models.config import BartConfig
from seal_tpu.parallel import mesh as mesh_lib


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 3e-5
    warmup_steps: int = 500
    total_steps: int = 800_000
    label_smoothing: float = 0.1  # fairseq --label-smoothing 0.1
    weight_decay: float = 0.01
    adam_b1: float = 0.9
    adam_b2: float = 0.999  # fairseq --adam-betas "(0.9, 0.999)"
    max_grad_norm: float = 0.1  # fairseq --clip-norm 0.1


def label_smoothed_nll(logits, targets, pad_id: int, eps: float):
    """fairseq's label_smoothed_cross_entropy: (1-eps)*nll + eps*mean(-logp)."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
    smooth = -lp.mean(axis=-1)
    mask = (targets != pad_id).astype(jnp.float32)
    loss = (1.0 - eps) * nll + eps * smooth
    ntok = jnp.maximum(mask.sum(), 1.0)
    return (loss * mask).sum() / ntok, ntok


def make_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.join_schedules(
        [
            optax.linear_schedule(0.0, tcfg.learning_rate, tcfg.warmup_steps),
            optax.polynomial_schedule(
                tcfg.learning_rate, 0.0, power=1.0,
                transition_steps=max(tcfg.total_steps - tcfg.warmup_steps, 1),
            ),
        ],
        [tcfg.warmup_steps],
    )
    return optax.chain(
        optax.clip_by_global_norm(tcfg.max_grad_norm),
        optax.adamw(
            schedule, b1=tcfg.adam_b1, b2=tcfg.adam_b2,
            weight_decay=tcfg.weight_decay,
        ),
    )


def loss_fn(model_cfg: BartConfig, params, batch, label_smoothing: float = 0.1):
    """batch: src_ids, src_mask, tgt_in (decoder inputs), tgt_out (labels)."""
    enc = bart.encode(model_cfg, params, batch["src_ids"], batch["src_mask"])
    logits = bart.decode_full(
        model_cfg, params, enc, batch["src_mask"], batch["tgt_in"],
        decoder_mask=batch.get("tgt_mask"),
    )
    loss, ntok = label_smoothed_nll(
        logits, batch["tgt_out"], model_cfg.pad_token_id, label_smoothing
    )
    return loss


def make_train_step(model_cfg: BartConfig, tcfg: TrainConfig, optimizer=None):
    optimizer = optimizer or make_optimizer(tcfg)

    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            partial(loss_fn, model_cfg, label_smoothing=tcfg.label_smoothing)
        )(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step, optimizer


def make_sharded_train_step(
    model_cfg: BartConfig,
    tcfg: TrainConfig,
    mesh: Mesh,
    tensor_parallel: bool = True,
):
    """jit the train step with explicit in/out shardings over the mesh.

    Params/opt-state follow ``param_pspecs`` (TP); the batch shards over
    ``data``.  XLA inserts the DP grad all-reduce and the TP collectives.
    """
    train_step, optimizer = make_train_step(model_cfg, tcfg)
    pspecs = mesh_lib.param_pspecs(model_cfg, tensor_parallel)
    param_sh = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), pspecs)
    batch_sh = NamedSharding(mesh, P("data", None))
    repl = NamedSharding(mesh, P())

    # opt-state shardings are left to the compiler (None): adam moments
    # inherit the param layout from the data flow
    jitted = jax.jit(
        train_step,
        in_shardings=(param_sh, None, {k: batch_sh for k in ("src_ids", "src_mask", "tgt_in", "tgt_out")}),
        out_shardings=(param_sh, None, repl),
    )
    return jitted, optimizer


def init_train_state(model_cfg: BartConfig, tcfg: TrainConfig, rng=None):
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    params = bart.init_params(rng, model_cfg)
    optimizer = make_optimizer(tcfg)
    opt_state = optimizer.init(params)
    return params, opt_state
