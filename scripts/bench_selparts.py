"""Micro-attribution of the NON-INDEX per-step decode machinery.

bench_phases (round 4) showed free decode (no index ops at all) costs the
same ~12 ms/step of non-model time as the constrained path: the shared
selection/bookkeeping machinery, not the FM-index ops, is the hot spot.
This times each shared piece in isolation at the bench operating point,
same scan methodology as bench_microphases (cost = (t - t_empty)/ITERS).

Pieces (B=32, K=15, V=50265 unless overridden):

  log_softmax   _log_softmax(logits[480, V])  bf16 -> f32
  min_length    _apply_min_length (at[].set on the V column)
  exact_topk    _exact_topk(lp, 64, blk=32)   round-0 proposal top-k
  topk256       _exact_topk(lp, 256, blk=32)  free-mode width
  lp_gather     take_along_axis(lp3, [B,K,96])  slab+window lp reads
  dedup158      _dedup_mask on [B,K,158]      merge-round dedup
  merge_topk    lax.top_k([B,K,158] -> 30)    buffer retention
  select        _select at fast-path ncand=97  dual-score selection
  reorder       reorder_cache (bart-large, 480 rows, L=10) + tokens gather
  hist_take     candidate takes + beam bookkeeping of one step

Run on the real chip: python scripts/bench_selparts.py [batch] [beam]
Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 300


def timeit(fn, n=3):
    fn()
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
    from jax import lax

    from seal_tpu.decoding import constrained as C
    from seal_tpu.decoding.constrained import DecodeConfig
    from seal_tpu.models import bart
    from seal_tpu.models.config import bart_large

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    beam = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    B, K, V = batch, beam, 50265
    R, L = B * K, 10
    rng = np.random.default_rng(0)

    logits = jnp.asarray(rng.normal(size=(R, V)), jnp.bfloat16)
    lp = jnp.asarray(rng.normal(size=(R, V)) - 12.0, jnp.float32)
    lp3 = lp.reshape(B, K, V)
    g96 = jnp.asarray(rng.integers(0, V, size=(B, K, 96)), jnp.int32)
    tok158 = jnp.asarray(rng.integers(0, V, size=(B, K, 158)), jnp.int32)
    lp158 = jnp.asarray(rng.normal(size=(B, K, 158)), jnp.float32)
    ncand = 97
    cons97 = jnp.asarray(rng.normal(size=(B, K, ncand)), jnp.float32)
    unc97 = jnp.asarray(rng.normal(size=(B, K, ncand)), jnp.float32)
    tok97 = jnp.asarray(rng.integers(0, V, size=(B, K, ncand)), jnp.int32)
    sel_par = jnp.asarray(rng.integers(0, K, size=(B, K)), jnp.int32)
    sel_tok = jnp.asarray(rng.integers(4, V, size=(B, K)), jnp.int32)

    mcfg = dataclasses.replace(bart_large(), dtype="bfloat16")
    cache = bart.empty_self_cache(mcfg, R, L)
    tokens = jnp.zeros((R, L), jnp.int32)

    cfg = DecodeConfig(
        num_beams=K, max_length=L, min_length=L - 1,
        eos_token_id=2, pad_token_id=1, decoder_start_token_id=2,
    )

    def scan_over(body, init):
        @jax.jit
        def run(init, *ops):
            def wrapped(c, i):
                return body(c, i, *ops)

            out, _ = lax.scan(wrapped, init, jnp.arange(ITERS, dtype=jnp.int32))
            return out

        def call(*ops):
            # np.asarray, not block_until_ready: through the axon tunnel
            # block_until_ready can return without waiting (measured: every
            # 300-iter program "took" 0.0 ms); a host transfer of the scalar
            # carry forces completion
            return lambda: np.asarray(run(init, *ops))

        return call

    def dep(x):
        # full reduction: element-[0] taps let XLA DCE all other rows of the
        # producing op (measured: every piece "cost" 0.002 ms that way)
        return jnp.sum(x.astype(jnp.float32))

    progs = {}

    progs["empty"] = scan_over(lambda c, i: (c + i.astype(jnp.float32), None),
                               jnp.float32(0))()

    def ls_body(c, i, logits):
        out = C._log_softmax(logits + c.astype(jnp.bfloat16))
        return c + dep(out), None

    progs["log_softmax"] = scan_over(ls_body, jnp.float32(0))(logits)

    def minlen_body(c, i, lp):
        out = C._apply_min_length(lp + c, i, cfg)
        return c + dep(out), None

    progs["min_length"] = scan_over(minlen_body, jnp.float32(0))(lp)

    def topk_body(c, i, lp):
        v, t = C._exact_topk(lp + c, 64, blk=32, assume_finite=True)
        return c + dep(v) + dep(t), None

    progs["exact_topk64"] = scan_over(topk_body, jnp.float32(0))(lp)

    def topk256_body(c, i, lp):
        v, t = C._exact_topk(lp + c, 256, blk=32, assume_finite=True)
        return c + dep(v) + dep(t), None

    progs["exact_topk256"] = scan_over(topk256_body, jnp.float32(0))(lp)

    def gather_body(c, i, lp3, g96):
        out = jnp.take_along_axis(lp3 + c, g96, axis=-1)
        return c + dep(out), None

    progs["lp_gather96"] = scan_over(gather_body, jnp.float32(0))(lp3, g96)

    def dedup_body(c, i, tok158):
        out = C._dedup_mask(tok158 + (c.astype(jnp.int32) % 2))
        return c + dep(out.astype(jnp.float32)), None

    progs["dedup158"] = scan_over(dedup_body, jnp.float32(0))(tok158)

    def mtopk_body(c, i, lp158):
        _, idx = lax.top_k(lp158 + c, 30)
        return c + dep(idx), None

    progs["merge_topk"] = scan_over(mtopk_body, jnp.float32(0))(lp158)

    def select_body(c, i, cons97, unc97, tok97):
        out = C._select(cfg, cons97 + c, unc97, tok97, K, V)
        return c + dep(out[0]) + dep(out[8]), None

    progs["select97"] = scan_over(select_body, jnp.float32(0))(cons97, unc97, tok97)

    def reorder_body(c, i, cache, tokens, sel_par):
        flat = (jnp.arange(B)[:, None] * K
                + (sel_par + c.astype(jnp.int32) % 2) % K).reshape(-1)
        new_cache = bart.reorder_cache(cache, flat)
        new_tokens = tokens[flat]
        return c + dep(new_tokens) + dep(new_cache[0]["k"]), None

    progs["reorder"] = scan_over(reorder_body, jnp.float32(0))(cache, tokens, sel_par)

    def hist_body(c, i, lo_hi, sel_par, sel_tok):
        lo, hi = lo_hi
        par_rows = jnp.arange(B)[:, None]
        sizes = hi - lo
        plo = lo[par_rows, sel_par] + c.astype(jnp.int32) % 2
        phi = hi[par_rows, sel_par]
        npc = sizes[par_rows, sel_par]
        fin = (sel_tok == 2) | (sel_tok == 1)
        nlo = jnp.where(fin, 0, plo)
        nhi = jnp.where(fin, 0, phi)
        return c + dep(nlo) + dep(nhi) + dep(npc), None

    lo = jnp.asarray(rng.integers(0, 1000, size=(B, K)), jnp.int32)
    hi = lo + jnp.asarray(rng.integers(1, 100, size=(B, K)), jnp.int32)
    progs["bookkeeping"] = scan_over(hist_body, jnp.float32(0))((lo, hi), sel_par, sel_tok)

    t_empty = timeit(progs.pop("empty"))
    out = {"batch": B, "beam": K, "iters": ITERS}
    for name, fn in progs.items():
        out[f"op_{name}_ms"] = round(max(0.0, (timeit(fn) - t_empty) / ITERS) * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
