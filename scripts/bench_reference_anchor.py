"""Measured reference-throughput anchor (replaces the round-2 pinned estimate).

Runs the GENUINE reference decode stack (executed sources from
/root/reference/seal: ``constrained_beam_search`` + ``IndexBasedLogitsProcessor``
+ ``BeamSearchScorerWithMemory``) at the NQ operating point (batch 20, beam
15, body-key length 10, ``/root/reference/README.md:76-83``) on the same
synthetic 1.2M-token corpus bench.py uses, and measures two things:

1. **Machinery-only upper bound** (``machinery_*``): the loop with an
   INSTANT model (precomputed logits tensor).  Everything that remains --
   per-beam Python->index ``get_range`` chains, ``get_distinct_count_multi``,
   mask building, torch top-k, the memory scorer's per-candidate history --
   is host-side work the reference performs serially with its GPU forward
   every step.  ``1 / machinery_s_per_query`` is therefore a hard upper
   bound on reference queries/sec on ANY accelerator.  A "generous" variant
   re-scales our numpy index costs to idealized sdsl numbers: distinct
   queries / 75 (the reference's std::async fanout across the README's 75
   jobs-class host), range chains / 3 (sdsl backward_search vs our
   searchsorted).

2. **Same-hardware architecture comparison** (``same_cpu_*``): the genuine
   reference loop vs our fused-scan ``fm_index_generate`` on this CPU, both
   backed by the identical JAX BART-large function (the reference shim uses
   the same cached ``decode_step``), identical weights, identical index.
   The model FLOPs are shared, so the delta isolates what the per-step
   host round-trip costs -- the thing the TPU build fuses away.

Usage: JAX_PLATFORMS=cpu python scripts/bench_reference_anchor.py
Prints one JSON line; paste the numbers into BASELINE.md.
"""

import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def build_world():
    import dataclasses

    import jax
    from seal_tpu.index import FMIndex
    from seal_tpu.models import bart, convert
    from seal_tpu.models.config import bart_large

    rng = np.random.default_rng(0)
    n_docs, doc_len, vocab = 10_000, 120, 50265
    zipf = rng.zipf(1.3, size=n_docs * doc_len)
    tokens = (zipf % (vocab - 10) + 4).astype(np.int64).reshape(n_docs, doc_len)
    docs = [row.tolist() + [2] for row in tokens]
    host = FMIndex()
    host.initialize(docs)

    cfg = bart_large()  # f32 on CPU for both sides
    params = bart.init_params(jax.random.PRNGKey(0), cfg)
    unigram = np.bincount(tokens.ravel() % vocab, minlength=vocab).astype(np.float64)
    log_unigram = np.log((unigram + 0.5) / (unigram.sum() + 0.5 * vocab))
    bias = 4.0 * (log_unigram - log_unigram.mean())
    params = dict(params)
    params["final_logits_bias"] = params["final_logits_bias"] + bias.astype(np.float32)
    params = convert.apply_seal_logits_bias(params, cfg)
    del dataclasses
    return host, cfg, params, np.asarray(params["final_logits_bias"]), rng


class TimingIndex:
    """Delegating index proxy accumulating range/distinct wall time."""

    def __init__(self, inner):
        self._inner = inner
        self.t_range = 0.0
        self.t_distinct = 0.0
        self.n_range = 0
        self.n_distinct = 0

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def get_range(self, seq):
        t0 = time.perf_counter()
        out = self._inner.get_range(seq)
        self.t_range += time.perf_counter() - t0
        self.n_range += 1
        return out

    def get_count(self, seq):
        t0 = time.perf_counter()
        out = self._inner.get_count(seq)
        self.t_range += time.perf_counter() - t0
        self.n_range += 1
        return out

    def get_distinct_count_multi(self, lows, highs):
        t0 = time.perf_counter()
        out = self._inner.get_distinct_count_multi(lows, highs)
        self.t_distinct += time.perf_counter() - t0
        self.n_distinct += len(lows)
        return out


def make_instant_model(cfg, logits_row):
    """4.13-surface model returning one precomputed logits row instantly."""
    import torch

    from test_reference_searcher_differential import Hf413ModelShim

    class Instant(Hf413ModelShim):
        def __init__(self):
            super().__init__(cfg, None)
            self._row = torch.from_numpy(logits_row.astype(np.float32))

        def _prepare_encoder_decoder_kwargs_for_generation(self, input_ids, model_kwargs):
            model_kwargs = dict(model_kwargs)
            model_kwargs["encoder_outputs"] = types.SimpleNamespace(
                last_hidden_state=torch.zeros((input_ids.shape[0], 1, 1)),
                get=lambda *a, **k: None,
            )
            return model_kwargs

        def __call__(self, decoder_input_ids=None, **kwargs):
            b = decoder_input_ids.shape[0]
            return types.SimpleNamespace(
                logits=self._row.expand(b, 1, self._row.shape[-1])
            )

    return Instant()


def make_cached_jax_model(cfg, params):
    """4.13-surface model running the repo's cached ``decode_step`` -- the
    same incremental forward our fused scan uses, so the reference side is
    not penalized with full re-decodes."""
    import jax
    import jax.numpy as jnp
    import torch

    from seal_tpu.models import bart
    from test_reference_searcher_differential import Hf413ModelShim

    step_fn = jax.jit(
        lambda p, tok, step, cache, ckv, eb: bart.decode_step(
            cfg, p, tok, step, cache, ckv, eb
        )
    )

    class Cached(Hf413ModelShim):
        def __init__(self):
            super().__init__(cfg, params)
            self._ckv = None
            self._eb = None
            self._max_len = 16

        def _expand_inputs_for_generation(self, input_ids, expand_size=1,
                                          is_encoder_decoder=True, **model_kwargs):
            input_ids, model_kwargs = super()._expand_inputs_for_generation(
                input_ids, expand_size, is_encoder_decoder, **model_kwargs
            )
            enc = jnp.asarray(
                model_kwargs["encoder_outputs"].last_hidden_state.numpy()
            )
            mask = jnp.asarray(model_kwargs["attention_mask"].numpy().astype(np.int32))
            self._ckv = bart.precompute_cross_kv(cfg, params, enc)
            self._eb = bart.encoder_bias(mask)
            return input_ids, model_kwargs

        def prepare_inputs_for_generation(self, decoder_input_ids, past=None,
                                          attention_mask=None, encoder_outputs=None,
                                          use_cache=None, **kwargs):
            if past is not None:
                decoder_input_ids = decoder_input_ids[:, -1:]
            return {"decoder_input_ids": decoder_input_ids, "past": past}

        def __call__(self, decoder_input_ids=None, past=None, **kwargs):
            rows = decoder_input_ids.shape[0]
            if past is None:
                cache = bart.empty_self_cache(cfg, rows, self._max_len)
                t = 0
            else:
                cache, t = past
            tok = jnp.asarray(decoder_input_ids[:, -1].numpy())
            logits, cache = step_fn(params, tok, t, cache, self._ckv, self._eb)
            out = types.SimpleNamespace(
                logits=torch.from_numpy(np.asarray(logits, np.float32))[:, None, :],
                past=(cache, t + 1),
            )
            return out

        def _update_model_kwargs_for_generation(self, outputs, model_kwargs,
                                                is_encoder_decoder=True):
            model_kwargs["past"] = outputs.past
            return model_kwargs

        def _reorder_cache(self, past, beam_idx):
            cache, t = past
            idx = jnp.asarray(beam_idx.numpy())
            cache = bart.reorder_cache(cache, idx)
            self._ckv = [
                (jnp.take(k, idx, axis=0), jnp.take(v, idx, axis=0))
                for k, v in self._ckv
            ]
            self._eb = jnp.take(self._eb, idx, axis=0)
            return (cache, t)

    return Cached()


def run_reference(bs_mod, model, index, cfg, queries_ids, K, L):
    import torch

    ids = torch.tensor(queries_ids, dtype=torch.long)
    mask = (ids != cfg.pad_token_id).long()
    return bs_mod.fm_index_generate(
        model, index, input_ids=ids, attention_mask=mask,
        min_length=L, max_length=L, length_penalty=0.0, num_beams=K,
        keep_history=True, disable_fm_index=False, forced_bos_token_id=None,
    )


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from test_reference_differential import ref_beam_search

    from seal_tpu.decoding.generate import fm_index_generate, pad_batch
    from seal_tpu.index.device_index import DeviceFMIndex

    host, cfg, params, logits_bias, rng = build_world()
    bs_mod = ref_beam_search()
    K, L = 15, 10
    vocab = cfg.vocab_size
    result = {}

    # ---- 1. machinery-only at the NQ operating point (batch 20) ----------
    batch = 20
    queries = [[0] + rng.integers(4, vocab, size=12).tolist() + [2] for _ in range(batch)]
    ids, _ = pad_batch(queries, cfg.pad_token_id)
    noise = np.random.default_rng(1).normal(0, 1.0, size=vocab)
    instant = make_instant_model(cfg, logits_bias + noise)
    timed = TimingIndex(host)
    run_reference(bs_mod, instant, timed, cfg, ids, K, L)  # warm caches
    timed = TimingIndex(host)
    t0 = time.perf_counter()
    out = run_reference(bs_mod, instant, timed, cfg, ids, K, L)
    t_mach = time.perf_counter() - t0
    n_keys = sum(len(h) for h in out)
    result.update(
        machinery_s_per_query=round(t_mach / batch, 4),
        machinery_bound_qps=round(batch / t_mach, 2),
        machinery_range_s=round(timed.t_range, 3),
        machinery_distinct_s=round(timed.t_distinct, 3),
        machinery_other_s=round(t_mach - timed.t_range - timed.t_distinct, 3),
        machinery_range_calls=timed.n_range,
        machinery_distinct_calls=timed.n_distinct,
        machinery_keys_per_query=round(n_keys / batch, 1),
    )
    # generous re-scaling toward idealized sdsl deployment (see module doc)
    t_generous = (t_mach - timed.t_range - timed.t_distinct
                  + timed.t_range / 3.0 + timed.t_distinct / 75.0)
    result["machinery_bound_qps_generous"] = round(batch / t_generous, 2)

    # ---- 2. same-CPU full stack, batch 2 ---------------------------------
    batch2 = 2
    q2 = queries[:batch2]
    ids2, mask2 = pad_batch(q2, cfg.pad_token_id)

    cached = make_cached_jax_model(cfg, params)
    t0 = time.perf_counter()
    ref_out = run_reference(bs_mod, cached, host, cfg, ids2, K, L)
    t_ref = time.perf_counter() - t0  # includes jit compile of decode_step

    cached = make_cached_jax_model(cfg, params)
    t0 = time.perf_counter()
    ref_out = run_reference(bs_mod, cached, host, cfg, ids2, K, L)
    t_ref = time.perf_counter() - t0

    dev = DeviceFMIndex.from_host(host, vocab=vocab)

    def ours():
        return fm_index_generate(
            cfg, params, dev, ids2, mask2, num_beams=K, max_length=L,
            min_length=L - 1, forced_bos_token_id=None,
        )

    ours()  # compile
    t0 = time.perf_counter()
    our_out = ours()
    t_ours = time.perf_counter() - t0

    result.update(
        same_cpu_ref_s_per_query=round(t_ref / batch2, 2),
        same_cpu_ours_s_per_query=round(t_ours / batch2, 2),
        same_cpu_ref_qps=round(batch2 / t_ref, 3),
        same_cpu_ours_qps=round(batch2 / t_ours, 3),
        same_cpu_speedup=round(t_ref / t_ours, 2),
        same_cpu_ref_keys=sum(len(h) for h in ref_out),
        same_cpu_our_keys=sum(len(h) for h in our_out),
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
