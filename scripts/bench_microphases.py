"""Micro-attribution of the constrained-decode step's device ops.

Standalone op dispatches through the tunnel are dispatch-bound (~40 ms
floor, CLAUDE.md), so each op is timed as a ``lax.scan`` of ``ITERS``
data-dependent iterations inside ONE jitted program; per-op cost is
(program_time - empty_scan_time) / ITERS.

Ops timed at the bench operating point (B=32, K=15, V=50265, 1.2M-token
index, chunk=64, window=128):

  top_k        lax.top_k(lp[480, V], 64)        proposal round 0
  validate     validate_tokens([480, 65])        rank chain, search_iters deep
  window       window_continuations(128)         interval enumeration
  buckets      bucket_counts                     bucket pruning gather+recount
  extend       extend_ranges([480])              per-step range update

Run on the real chip: python scripts/bench_microphases.py [batch] [beam]
Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 50


def timeit(fn, n=3):
    fn()  # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from seal_tpu.index import FMIndex
    from seal_tpu.index.device_index import DeviceFMIndex
    from seal_tpu.index.wavelet import WaveletFMIndex
    from seal_tpu.ops import fm_ops as psi_ops
    from seal_tpu.ops import wt_ops

    layout = "psi"
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    for a in sys.argv[1:]:
        if a.startswith("--layout="):
            layout = a.split("=", 1)[1]
    batch = int(argv[0]) if len(argv) > 0 else 32
    beam = int(argv[1]) if len(argv) > 1 else 15
    window, V = 128, 50265
    chunk = max(64, 4 * beam)  # decode round-0 width: max(exact_chunk, 2*n_buf)
    B, K = batch, beam
    R = B * K

    rng = np.random.default_rng(0)
    n_docs, doc_len = 10_000, 120
    zipf = rng.zipf(1.3, size=n_docs * doc_len)
    tokens = (zipf % (V - 10) + 4).astype(np.int64).reshape(n_docs, doc_len)
    docs = [row.tolist() + [2] for row in tokens]
    host = FMIndex()
    host.initialize(docs)
    if layout == "psi":
        index = DeviceFMIndex.from_host(host, vocab=V)
        fm_ops = psi_ops
    elif layout == "compact":
        index = WaveletFMIndex.from_host(host, vocab=V)
        fm_ops = wt_ops
    elif layout == "hybrid":
        index = WaveletFMIndex.from_host(host, vocab=V, keep_bwt=True)
        fm_ops = wt_ops
    else:
        raise SystemExit(f"unknown layout {layout}")

    # Live-looking state: mid-size intervals + random candidate tokens.
    lo_np = rng.integers(0, index.n_rows - 4096, size=(B, K))
    hi_np = lo_np + rng.integers(2, 4096, size=(B, K))
    lo = jnp.asarray(lo_np, jnp.int32)
    hi = jnp.asarray(hi_np, jnp.int32)
    lp = jnp.asarray(rng.standard_normal((R, V)), jnp.float32)
    toks = jnp.asarray(rng.integers(4, V, size=(B, K, chunk + 1)), jnp.int32)
    one_tok = jnp.asarray(rng.integers(4, V, size=(B, K)), jnp.int32)

    def scan_over(body, init):
        # query-shaped operands (lp is batch x vocab -- 412 MB at config5)
        # must enter as jit ARGUMENTS: closure-captured arrays become jaxpr
        # constants and overflow the tunnel's remote-compile payload (413)
        @jax.jit
        def run(init, lp_, lo_, hi_, toks_, one_tok_):
            def wrapped(c, i):
                return body(c, i, lp_, lo_, hi_, toks_, one_tok_)

            out, _ = lax.scan(wrapped, init, jnp.arange(ITERS, dtype=jnp.int32))
            return out

        # np.asarray (host transfer), not block_until_ready: the latter can
        # return without waiting through the axon tunnel (selparts round 4)
        return lambda: np.asarray(run(init, lp, lo, hi, toks, one_tok))

    # data-dependence: fold a cheap reduction of the result into the carry
    # so XLA cannot hoist the op out of the scan.
    def dep(x):
        return jnp.asarray(x).ravel()[:8].sum().astype(jnp.int32)

    progs = {}

    progs["empty"] = scan_over(lambda c, i, *o: (c + i, None), jnp.int32(0))

    def top_k_body(c, i, lp, lo, hi, toks, one_tok):
        v, t = lax.top_k(lp + (c % 2).astype(jnp.float32), chunk)
        return c + dep(t), None

    progs["top_k"] = scan_over(top_k_body, jnp.int32(0))

    def block_topk_body(c, i, lp, lo, hi, toks, one_tok):
        from seal_tpu.decoding.constrained import _exact_topk

        v, t = _exact_topk(lp + (c % 2).astype(jnp.float32), chunk, blk=32,
                           assume_finite=True)
        return c + dep(t), None

    progs["block_topk"] = scan_over(block_topk_body, jnp.int32(0))

    def validate_body(c, i, lp, lo, hi, toks, one_tok):
        cnt = fm_ops.validate_tokens(index, toks + (c % 2), lo, hi)
        return c + dep(cnt), None

    progs["validate"] = scan_over(validate_body, jnp.int32(0))

    def contains_body(c, i, lp, lo, hi, toks, one_tok):
        ok = fm_ops.contains_tokens(index, toks + (c % 2), lo, hi)
        return c + dep(ok.astype(jnp.int32)), None

    progs["contains"] = scan_over(contains_body, jnp.int32(0))

    def window_body(c, i, lp, lo, hi, toks, one_tok):
        wt, wv = fm_ops.window_continuations(index, lo + (c % 2), hi, window)
        return c + dep(wt), None

    progs["window"] = scan_over(window_body, jnp.int32(0))

    def buckets_body(c, i, lp, lo, hi, toks, one_tok):
        bc = fm_ops.bucket_counts(index, lo + (c % 2), hi)
        return c + dep(bc), None

    progs["buckets"] = scan_over(buckets_body, jnp.int32(0))

    def extend_body(c, i, lp, lo, hi, toks, one_tok):
        nlo, nhi = fm_ops.extend_ranges(index, one_tok + (c % 2), lo, hi)
        return c + dep(nhi), None

    progs["extend"] = scan_over(extend_body, jnp.int32(0))

    base = timeit(progs.pop("empty"))
    out = {"layout": layout, "batch": B, "beam": K, "iters": ITERS}
    for name, fn in progs.items():
        total = timeit(fn)
        out[f"op_{name}_ms"] = round(max(total - base, 0.0) / ITERS * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
