"""Per-phase device timing of the constrained-decode hot path (VERDICT r2 #2).

Times isolated jitted programs at the bench operating point (BART-large
bf16, batch 32, beam 15, len 10, 1.2M-token index) so the 0.3 s/batch
steady-state cost can be attributed:

  encoder        encoder fwd + beam-tiled cross-KV precompute
  model_scan     S cached decode_steps + log_softmax, greedy feed (no
                 constraint ops, no selection) -- the pure model path
  free_decode    fm_index_generate(disable_fm_index=True): model + dual
                 top-k selection + history, no index ops
  constrained    the default exact decode
  derived:       selection = free_decode - model_scan - encoder
                 constraint = constrained - free_decode

Run on the real chip: python scripts/bench_phases.py [batch] [beam]
Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, n=3):
    fn()  # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from seal_tpu.decoding.generate import fm_index_generate, pad_batch
    from seal_tpu.index import FMIndex
    from seal_tpu.index.device_index import DeviceFMIndex
    from seal_tpu.models import bart, convert
    from seal_tpu.models.config import bart_large

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    beam = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    length = 10

    rng = np.random.default_rng(0)
    n_docs, doc_len, vocab = 10_000, 120, 50265
    zipf = rng.zipf(1.3, size=n_docs * doc_len)
    tokens = (zipf % (vocab - 10) + 4).astype(np.int64).reshape(n_docs, doc_len)
    docs = [row.tolist() + [2] for row in tokens]
    host = FMIndex()
    host.initialize(docs)
    index = DeviceFMIndex.from_host(host, vocab=vocab)

    cfg = dataclasses.replace(bart_large(), dtype="bfloat16")
    params = bart.init_params(jax.random.PRNGKey(0), cfg)
    unigram = np.bincount(tokens.ravel() % vocab, minlength=vocab).astype(np.float64)
    log_unigram = np.log((unigram + 0.5) / (unigram.sum() + 0.5 * vocab))
    params = dict(params)
    params["final_logits_bias"] = params["final_logits_bias"] + 4.0 * (
        log_unigram - log_unigram.mean()
    ).astype(np.float32)
    params = convert.apply_seal_logits_bias(params, cfg)
    from seal_tpu.models.api import cast_params

    params = cast_params(cfg, params)  # bf16 weight copies, as bench.py
    params = jax.device_put(params)

    queries = [[0] + rng.integers(4, vocab, size=12).tolist() + [2] for _ in range(batch)]
    ids, mask = pad_batch(queries, cfg.pad_token_id)
    ids = jnp.asarray(ids)
    mask = jnp.asarray(mask)
    rows = batch * beam
    S = length - 1


    def _force(out):
        # host transfer of the smallest output leaf; block_until_ready can
        # return without waiting through the axon tunnel (round 4)
        import jax as _jax
        leaves = _jax.tree_util.tree_leaves(out)
        np.asarray(min(leaves, key=lambda a: getattr(a, "size", 0)))

    # ---- encoder + cross-KV ---------------------------------------------
    @jax.jit
    def enc_fn(params, ids, mask):
        enc = bart.encode(cfg, params, ids, mask)
        enc_t = jnp.repeat(enc, beam, axis=0)
        mask_t = jnp.repeat(mask, beam, axis=0)
        ckv = bart.precompute_cross_kv(cfg, params, enc_t)
        return ckv, bart.encoder_bias(mask_t)

    t_enc = timeit(lambda: _force(enc_fn(params, ids, mask)))

    # ---- pure model scan (greedy feed, no constraints/selection) ---------
    @jax.jit
    def model_scan(params, ids, mask):
        ckv, eb = enc_fn(params, ids, mask)
        cache = bart.empty_self_cache(cfg, rows, length)
        tok0 = jnp.full((rows,), cfg.decoder_start_token_id, jnp.int32)

        def step(carry, t):
            tok, cache = carry
            logits, cache = bart.decode_step(cfg, params, tok, t, cache, ckv, eb)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nxt = jnp.argmax(lp, axis=-1).astype(jnp.int32)
            return (nxt, cache), lp.max(-1)

        (_, _), out = jax.lax.scan(step, (tok0, cache), jnp.arange(S, dtype=jnp.int32))
        return out

    t_model = timeit(lambda: _force(model_scan(params, ids, mask)))

    # ---- free decode (model + selection + history, no index) -------------
    def free():
        return fm_index_generate(
            cfg, params, index, ids, mask, num_beams=beam, max_length=length,
            min_length=length - 1, forced_bos_token_id=None, disable_fm_index=True,
        )

    t_free = timeit(free)

    # ---- default constrained ---------------------------------------------
    def constrained():
        return fm_index_generate(
            cfg, params, index, ids, mask, num_beams=beam, max_length=length,
            min_length=length - 1, forced_bos_token_id=None,
        )

    t_cons = timeit(constrained)

    result = {
        "batch": batch,
        "beam": beam,
        "phase_encoder_s": round(t_enc, 4),
        "phase_model_scan_s": round(t_model, 4),
        "phase_free_decode_s": round(t_free, 4),
        "phase_constrained_s": round(t_cons, 4),
        "derived_selection_s": round(t_free - t_model, 4),
        "derived_constraint_s": round(t_cons - t_free, 4),
        "qps": round(batch / t_cons, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
