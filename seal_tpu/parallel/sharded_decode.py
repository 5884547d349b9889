"""Constrained generation with the FM-index sharded across the mesh.

BASELINE.md config 5 ("index partitioned across TPU mesh"): when the corpus
does not fit one chip's HBM, documents shard across devices
(``ShardedFMIndex``) and the *whole fused beam search* runs inside
``shard_map`` over the ``data`` axis:

* the decoder forward is computed redundantly on every shard (replicated
  params/queries) -- the cost of index capacity;
* each shard carries its own local ``[lo, hi)`` beam ranges (an FM-index
  over a sub-corpus is a complete FM-index, so ranges never need to sync);
* global constraint decisions merge with collectives: candidate-validation
  counts and range sizes ``psum`` over shards, window continuations
  ``all_gather`` so every shard sees the union candidate set;
* all merged quantities are shard-invariant, so every shard computes the
  identical beam selection and the outputs replicate (``out_specs=P()``).

Keys produced are grounded in the *union* corpus: a key is valid iff it
occurs in at least one shard.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from seal_tpu.decoding.constrained import (
    DecodeConfig,
    check_dense_budget,
    constrained_beam_search,
    resolve_window,
)
from seal_tpu.decoding.generate import extract_hypotheses, pad_batch
from seal_tpu.index.device_index import DeviceFMIndex
from seal_tpu.models import api as model_api
from seal_tpu.ops import fm_ops
from seal_tpu.parallel.sharded_index import ShardedFMIndex

AXIS = "data"


class ShardedIndexOps:
    """Constraint ops over one shard's arrays with cross-shard merging.

    Used inside ``shard_map``: ``dev`` wraps this device's shard block;
    ``n_rows`` is the shard's true row count (ranges start at [0, n_rows)).
    """

    def __init__(self, dev: DeviceFMIndex, n_rows, axis: str = AXIS):
        self.dev = dev
        self.n_rows = n_rows
        self.axis = axis

    def _vary(self, x):
        """Mark a shard-invariant value as varying over the axis (idempotent)."""
        try:
            if self.axis in getattr(jax.typeof(x), "vma", frozenset()):
                return x
        except Exception:
            pass
        return jax.lax.pvary(x, (self.axis,))

    def full_range(self, shape):
        lo = self._vary(jnp.zeros(shape, jnp.int32))
        hi = jnp.broadcast_to(self.n_rows, shape).astype(jnp.int32)
        return lo, hi

    def range_for(self, tokens, lengths):
        lo, hi = self.full_range(tokens.shape[:-1])

        def body(carry, tok_t):
            lo, hi, t = carry
            nlo, nhi = fm_ops.backward_step(self.dev, tok_t, lo, hi)
            keep = t < lengths
            return (jnp.where(keep, nlo, lo), jnp.where(keep, nhi, hi), t + 1), None

        (lo, hi, _), _ = lax.scan(
            body, (lo, hi, jnp.int32(0)), jnp.moveaxis(tokens, -1, 0)
        )
        return lo, hi

    def corpus_mask(self):
        return self.dev.corpus_counts > 0  # global counts, replicated

    def validate(self, tokens, lo, hi):
        local = fm_ops.validate_tokens(self.dev, self._vary(tokens), lo, hi)
        return lax.psum(local, self.axis)

    def contains(self, tokens, lo, hi):
        # membership ORs across shards: psum of 0/1 then > 0
        local = fm_ops.contains_tokens(self.dev, self._vary(tokens), lo, hi)
        return lax.psum(local.astype(jnp.int32), self.axis) > 0

    def window(self, lo, hi, w):
        toks, valid = fm_ops.window_continuations(self.dev, lo, hi, w)
        # union candidate set: each shard scatters its window into its slot
        # of a [n_shards*w] buffer and the buffers psum-merge.  (all_gather
        # would be the natural op but its output stays vma-varying, which
        # would poison the whole beam state; psum produces invariant.)
        n = lax.axis_size(self.axis)
        idx = lax.axis_index(self.axis)
        buf_t = jnp.zeros(toks.shape[:-1] + (n * w,), jnp.int32)
        buf_v = jnp.zeros(valid.shape[:-1] + (n * w,), jnp.int32)
        buf_t = lax.dynamic_update_slice_in_dim(
            buf_t, jnp.where(valid, toks, 0).astype(jnp.int32), idx * w, axis=-1
        )
        buf_v = lax.dynamic_update_slice_in_dim(
            buf_v, valid.astype(jnp.int32), idx * w, axis=-1
        )
        toks_g = lax.psum(buf_t, self.axis)
        valid_g = lax.psum(buf_v, self.axis) > 0
        return jnp.where(valid_g, toks_g, -1), valid_g

    def extend(self, tokens, lo, hi):
        return fm_ops.backward_step(self.dev, self._vary(tokens), lo, hi)

    def range_size(self, lo, hi):
        return lax.psum(hi - lo, self.axis)

    def window_exhaustive(self, lo, hi, w):
        """True where every shard's local interval fits its w window slots
        (then the psum-merged window holds the union's full distinct set)."""
        local_over = ((hi - lo) > w).astype(jnp.int32)
        return lax.psum(local_over, self.axis) == 0

    def interval_covered(self, lo, hi, rows_done):
        """True where ``rows_done`` rows per shard enumerate every shard's
        local interval (then the union's distinct set has been seen)."""
        local_over = ((hi - lo) > rows_done).astype(jnp.int32)
        return lax.psum(local_over, self.axis) == 0

    def bucket_counts(self, lo, hi):
        return lax.psum(fm_ops.bucket_counts(self.dev, lo, hi), self.axis)

    def bucket_size(self):
        return self.dev.bucket_size

    def n_buckets(self):
        return fm_ops.bucket_counts_width(self.dev)

    def dense_counts(self, lo, hi, chunk):
        return lax.psum(fm_ops.dense_counts(self.dev, lo, hi, chunk=chunk), self.axis)


@lru_cache(maxsize=16)
def _jitted_sharded_search(model_cfg, dcfg: DecodeConfig, mesh: Mesh, statics):
    """statics = (n_rows_padded, sigma, vocab, n_docs_padded, search_iters)."""
    from jax.experimental.shard_map import shard_map

    bart = model_api.module_for(model_cfg)
    n_rows_pad, sigma, vocab, n_docs_pad, search_iters, bucket_size = statics

    def per_shard(bwt, psi, C, beg, n_rows, bocc, counts, params, ids, mask, key):
        dev = DeviceFMIndex(
            text=None, sa=None, psi=psi[0], bwt=bwt[0], C=C[0], beginnings=beg[0],
            corpus_counts=counts, bucket_occ=bocc[0],
            n_rows=n_rows_pad, sigma=sigma, vocab=vocab, n_docs=n_docs_pad,
            search_iters=search_iters, bucket_size=bucket_size,
        )
        ops = ShardedIndexOps(dev, n_rows[0])
        enc = bart.encode(model_cfg, params, ids, mask)
        return constrained_beam_search(
            model_cfg, params, None, dcfg, enc, mask, key, index_ops=ops
        )

    def run(si: ShardedFMIndex, params, ids, mask, key):
        fn = shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(
                P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS),
                P(), P(), P(), P(), P(),
            ),
            out_specs=P(),
        )
        return fn(
            si.bwt, si.psi, si.C, si.beginnings, si.n_rows, si.bucket_occ,
            si.corpus_counts, params, ids, mask, key,
        )

    return jax.jit(run)


def sharded_fm_index_generate(
    model_cfg,
    params,
    sharded_index: ShardedFMIndex,
    mesh: Mesh,
    input_ids,
    attention_mask=None,
    **kwargs,
):
    """``fm_index_generate`` with the index sharded over the mesh's data axis.

    Accepts the same generation kwargs as ``fm_index_generate`` (sample /
    diverse modes included).  The sharded index must already be placed on
    the mesh (``ShardedFMIndex.place``).
    """
    if isinstance(input_ids, (list, tuple)):
        input_ids, attention_mask = pad_batch(input_ids, model_cfg.pad_token_id)
    if attention_mask is None:
        attention_mask = (np.asarray(input_ids) != model_cfg.pad_token_id).astype(np.int32)

    kwargs.pop("length_penalty", None)  # parity no-ops (see fm_index_generate)
    kwargs.pop("keep_history", None)
    seed = kwargs.pop("seed", 0)
    eos = kwargs.pop("eos_token_id", None)
    forced_bos = kwargs.pop("forced_bos_token_id", model_cfg.forced_bos_token_id)
    force_from = kwargs.pop("force_decoding_from", None)
    num_beams = kwargs.pop("num_beams", 3)
    dcfg = DecodeConfig(
        num_beams=num_beams,
        max_length=kwargs.pop("max_length", 25),
        min_length=kwargs.pop("min_length", 3),
        eos_token_id=int(eos if eos is not None else model_cfg.eos_token_id),
        pad_token_id=model_cfg.pad_token_id,
        decoder_start_token_id=model_cfg.decoder_start_token_id,
        forced_bos_token_id=forced_bos,
        force_decoding_from=tuple(force_from) if force_from else None,
        stop_at_count=kwargs.pop("stop_at_count", 0),
        always_allow_eos=kwargs.pop("always_allow_eos", False),
        disable_fm_index=kwargs.pop("disable_fm_index", False),
        top_m=min(kwargs.pop("top_m", 256), model_cfg.vocab_size),
        window=resolve_window(
            kwargs.pop("window", 0), num_beams, kwargs.get("speculative", False)
        ),
        exact_chunk=kwargs.pop("exact_chunk", 64),
        exact_loop_chunk=kwargs.pop("exact_loop_chunk", 0),
        dense_chunk=kwargs.pop("dense_chunk", 2048),
        speculative=kwargs.pop("speculative", False),
        exact_mask=kwargs.pop("exact_mask", False),
        exact_ties=kwargs.pop("exact_ties", False),
        sample=kwargs.pop("sample", False),
        topk=kwargs.pop("topk", 0),
        num_groups=kwargs.pop("diverse_bs_groups", 1),
        diversity_penalty=kwargs.pop("diverse_bs_penalty", 0.0),
    )
    if kwargs:
        raise TypeError(f"unexpected kwargs: {sorted(kwargs)}")
    check_dense_budget(dcfg, int(np.asarray(input_ids).shape[0]), model_cfg.vocab_size)
    statics = (
        sharded_index.bwt.shape[1],
        sharded_index.C.shape[1] - 1,
        sharded_index.vocab,
        sharded_index.beginnings.shape[1] - 1,
        sharded_index.search_iters,
        sharded_index.bucket_size,
    )
    run = _jitted_sharded_search(model_cfg, dcfg, mesh, statics)
    out = run(
        sharded_index,
        params,
        jnp.asarray(input_ids),
        jnp.asarray(attention_mask),
        jax.random.PRNGKey(seed),
    )
    fetched = jax.device_get(out)
    if (
        fetched.fallback_steps is not None
        and int(fetched.fallback_steps)
        and not dcfg.force_full
    ):
        # deferred exactness fallback, same host-side redo as generate.py
        import dataclasses as _dc

        full = _jitted_sharded_search(
            model_cfg, _dc.replace(dcfg, force_full=True), mesh, statics
        )
        fetched = jax.device_get(
            full(
                sharded_index,
                params,
                jnp.asarray(input_ids),
                jnp.asarray(attention_mask),
                jax.random.PRNGKey(seed),
            )
        )
    return extract_hypotheses(fetched, dcfg)
