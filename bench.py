"""Benchmark: constrained key-generation throughput (queries/sec/chip) + MFU.

Measures the system's hot path -- FM-index-constrained beam search over
BART-large at the reference's NQ operating point (beam 15, body-key length
10, ``/root/reference/README.md:76-83``) -- on a synthetic Wikipedia-scale
slice (10k docs, ~1.2M tokens, BART vocab) with randomly initialized
weights (no network access for checkpoints; throughput is
weight-independent).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "mfu", ...}.

``vs_baseline`` compares against 2.33 queries/sec -- the MEASURED upper
bound on the reference stack at the same operating point: running the
genuine reference decode loop with an instant model leaves 0.43 s/query of
host-side machinery (per-beam Python->index round-trips, mask building, the
memory scorer) that is serial with any GPU forward, so the reference cannot
exceed 1/0.43 q/s on any accelerator (scripts/bench_reference_anchor.py;
BASELINE.md rows "measured, round 3").  ``vs_baseline_generous`` divides by
4.52 q/s instead (idealized-sdsl + 75-thread adjustments).

Resilience: the axon tunnel occasionally drops a remote-compile response
mid-read (round-1 failure, BENCH_r01.json). Every device call is retried,
and the JSON line is emitted from however many timed iterations survived.
"""

import json
import sys
import time
import traceback

import numpy as np

# Approximate peak dense bf16 FLOP/s per chip, by device_kind substring.
_PEAK_FLOPS = [
    ("v5 lite", 197e12),
    ("v5e", 197e12),
    ("v5p", 459e12),
    ("v6e", 918e12),
    ("v6 lite", 918e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 45e12),
]


def _peak_flops(device) -> float | None:
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in _PEAK_FLOPS:
        if key in kind:
            return peak
    return None


def decode_flops(cfg, batch: int, beam: int, src_len: int, steps: int) -> float:
    """Analytic forward-FLOPs of one ``fm_index_generate`` call.

    Mirrors the jitted computation (seal_tpu/decoding/constrained.py):
    encoder over [B, Lsrc], cross-KV precompute over the beam-tiled
    [B*K, Lsrc] rows, then ``steps`` cached decoder steps over [B*K, 1]
    with the vocab-logit matmul. Matmul-only (2 FLOPs per MAC); elementwise
    and index-kernel work excluded -- the MFU reported is therefore a
    slight underestimate.
    """
    d, f, v = cfg.d_model, cfg.encoder_ffn_dim, cfg.vocab_size
    n_enc, n_dec = cfg.encoder_layers, cfg.decoder_layers
    rows = batch * beam

    # Encoder: per token per layer QKVO (8d^2) + scores/AV (4*d*Lsrc) + FFN.
    enc = batch * src_len * n_enc * (8 * d * d + 4 * d * src_len + 4 * d * f)
    # Cross-KV precompute: projected per QUERY and repeated across beams
    # (round 5; previously computed on the beam-tiled rows).
    cross_kv = batch * src_len * n_dec * (4 * d * d)
    # Decoder steps: self QKVO + self scores (avg cache len ~steps/2) +
    # cross Q,O + cross scores + FFN, then the vocab projection.  Step 0
    # runs on [batch] rows (one live beam per query, round 5); the
    # remaining steps on the beam-tiled rows.
    per_tok = n_dec * (
        8 * d * d + 4 * d * (steps / 2) + 4 * d * d + 4 * d * src_len + 4 * d * f
    )
    dec_rows_steps = rows * max(steps - 1, 0) + batch
    dec = dec_rows_steps * (per_tok + 2 * d * v)
    return float(enc + cross_kv + dec)


def _retry(fn, attempts=3, label=""):
    for i in range(attempts):
        try:
            return fn()
        except Exception:
            if i == attempts - 1:
                raise
            print(f"# retrying {label} after error:", file=sys.stderr)
            traceback.print_exc(limit=1, file=sys.stderr)
            time.sleep(5.0 * (i + 1))


def _preflight_backend(timeout_s: float = 240.0) -> None:
    """Fail fast (one JSON error line) when the device backend is wedged.

    The tunneled TPU worker can become unresponsive in a way that makes
    ``jax.devices()`` block forever in THIS process (observed round 3);
    probing device init in a subprocess with a timeout turns an opaque
    driver-level hang into a legible error result.
    """
    import subprocess

    try:
        p = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        if p.returncode == 0:
            return
        detail = (p.stderr or b"").decode(errors="replace").strip()[-300:]
    except subprocess.TimeoutExpired:
        detail = f"device init unresponsive after {timeout_s:.0f}s"
    print(f"# backend preflight failed: {detail}", file=sys.stderr)
    print(json.dumps({
        "metric": "constrained key-generation queries/sec/chip",
        "value": None,
        "unit": "queries/sec",
        "error": f"device backend unavailable: {detail or 'init failed'}",
    }))
    sys.exit(1)


def main():
    _preflight_backend()
    import jax

    import seal_tpu  # noqa: F401
    from seal_tpu.decoding.generate import (
        fm_index_generate,
        fm_index_generate_async,
        pad_batch,
    )
    from seal_tpu.index import FMIndex
    from seal_tpu.index.device_index import DeviceFMIndex
    from seal_tpu.models import bart, convert
    from seal_tpu.models.config import bart_large
    import dataclasses

    dev = jax.devices()[0]
    platform = dev.platform

    # ---- synthetic corpus: 10k docs, Zipf token distribution -------------
    rng = np.random.default_rng(0)
    n_docs, doc_len, vocab = 10_000, 120, 50265
    zipf = rng.zipf(1.3, size=n_docs * doc_len)
    tokens = (zipf % (vocab - 10) + 4).astype(np.int64).reshape(n_docs, doc_len)
    docs = [row.tolist() + [2] for row in tokens]

    t0 = time.time()
    host = FMIndex()
    host.initialize(docs)
    build_s = time.time() - t0
    index = _retry(lambda: DeviceFMIndex.from_host(host, vocab=vocab), label="index ship")

    # ---- model: BART-large, bf16 compute ---------------------------------
    # Random weights (no checkpoint egress) + a corpus-unigram logit bias:
    # a trained SEAL model concentrates LM mass on corpus-plausible tokens,
    # which is what makes the exact proposal loop converge in one round.
    # Pure-random weights spread mass uniformly over the vocab -- an
    # operating point no trained model exhibits -- so the bias restores the
    # realistic workload shape while keeping throughput weight-independent.
    cfg = dataclasses.replace(bart_large(), dtype="bfloat16")
    params = _retry(lambda: bart.init_params(jax.random.PRNGKey(0), cfg), label="init")
    unigram = np.bincount(tokens.ravel() % vocab, minlength=vocab).astype(np.float64)
    log_unigram = np.log((unigram + 0.5) / (unigram.sum() + 0.5 * vocab))
    params = dict(params)
    params["final_logits_bias"] = params["final_logits_bias"] + 4.0 * (
        log_unigram - log_unigram.mean()
    ).astype(np.float32)
    params = convert.apply_seal_logits_bias(params, cfg)
    # serve from bf16 weight copies: halves per-step HBM weight traffic
    from seal_tpu.models.api import cast_params

    params = cast_params(cfg, params)

    # ---- queries: batch 32, beam 15, length 10 ---------------------------
    batch, beam, length = 32, 15, 10
    queries = [
        [0] + rng.integers(4, vocab, size=12).tolist() + [2] for _ in range(batch)
    ]
    ids, mask = pad_batch(queries, cfg.pad_token_id)

    def run():
        return fm_index_generate(
            cfg, params, index, ids, mask,
            num_beams=beam, max_length=length, min_length=length - 1,
            forced_bos_token_id=None,
        )

    t0 = time.time()
    out = _retry(run, attempts=4, label="compile+first run")
    compile_s = time.time() - t0

    # Timed iterations, each individually retried; keep whatever survives.
    n_iters, times = 3, []
    for i in range(n_iters):
        try:
            t0 = time.time()
            out = _retry(run, attempts=2, label=f"iter {i}")
            times.append(time.time() - t0)
        except Exception:
            print(f"# iter {i} failed permanently; reporting partial", file=sys.stderr)
            traceback.print_exc(limit=3, file=sys.stderr)
            break
    if not times:  # fall back to the (compile-inflated) first run
        times = [compile_s]

    per_batch = float(np.median(times))
    sync_qps = batch / per_batch

    # snapshot the fast-path fallback counters of the LAST timed sync run
    # before later measurements (config5 / max-batch / e2e) overwrite them
    from seal_tpu.decoding.generate import LAST_DECODE_STATS

    fallback_stats = dict(LAST_DECODE_STATS)

    # ---- pipelined serving loop (the PRIMARY metric) ----------------------
    # Dispatch batch N+1 before finalizing batch N: JAX dispatch is async,
    # so the host transfer + hypothesis backtrack of batch N overlap batch
    # N+1's device compute -- the steady-state serving pipeline
    # (fm_index_generate_async; the searcher's pipelining does the same
    # overlap against ranking).  Throughput = total queries / wall time.
    def dispatch():
        return fm_index_generate_async(
            cfg, params, index, ids, mask,
            num_beams=beam, max_length=length, min_length=length - 1,
            forced_bos_token_id=None,
        )

    qps = sync_qps
    try:
        n_pipe = 6
        t0 = time.time()
        pending = None
        for _ in range(n_pipe):
            nxt = _retry(dispatch, attempts=2, label="pipelined dispatch")
            if pending is not None:
                pending()
            pending = nxt
        pending()
        pipe_wall = time.time() - t0
        qps = batch * n_pipe / pipe_wall
        print(
            f"# pipelined: {n_pipe} batches in {pipe_wall:.2f}s "
            f"({pipe_wall / n_pipe:.3f} s/batch vs {per_batch:.3f} sync)",
            file=sys.stderr,
        )
    except Exception:
        print("# pipelined loop failed; falling back to sync qps", file=sys.stderr)
        traceback.print_exc(limit=3, file=sys.stderr)

    # MFU: analytic model FLOPs per query x delivered queries/sec / peak --
    # uses the pipelined (serving) throughput when available.
    flops = decode_flops(cfg, batch, beam, ids.shape[1], length)
    peak = _peak_flops(dev)
    mfu = round(flops / batch * qps / peak, 4) if peak else None

    # ---- per-phase attribution (VERDICT r2 #2) ---------------------------
    # Times isolated jitted programs for the model-only share; the full
    # split (incl. free-decode selection) lives in scripts/bench_phases.py.
    phases = {}
    try:
        import jax.numpy as jnp

        rows = batch * beam
        S = length - 1
        jids, jmask = jnp.asarray(ids), jnp.asarray(mask)

        @jax.jit
        def enc_fn(params, ids_, mask_):
            enc = bart.encode(cfg, params, ids_, mask_)
            enc_t = jnp.repeat(enc, beam, axis=0)
            mask_t = jnp.repeat(mask_, beam, axis=0)
            ckv = bart.precompute_cross_kv(cfg, params, enc_t)
            return ckv, bart.encoder_bias(mask_t)

        @jax.jit
        def model_scan(params, ids_, mask_):
            ckv, eb = enc_fn(params, ids_, mask_)
            cache = bart.empty_self_cache(cfg, rows, length)
            tok0 = jnp.full((rows,), cfg.decoder_start_token_id, jnp.int32)

            def step(carry, t):
                tok, cache = carry
                logits, cache = bart.decode_step(cfg, params, tok, t, cache, ckv, eb)
                lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                nxt = jnp.argmax(lp, axis=-1).astype(jnp.int32)
                return (nxt, cache), lp.max(-1)

            (_, _), out_ = jax.lax.scan(step, (tok0, cache), jnp.arange(S, dtype=jnp.int32))
            return out_

        def _force(out):
            # host-transfer the SMALLEST output leaf: through the axon
            # tunnel block_until_ready can return without waiting (selparts
            # debugging, round 4), while transferring any one output buffer
            # forces the whole executable to finish; picking the smallest
            # keeps the transfer cost out of the measurement
            leaves = jax.tree_util.tree_leaves(out)
            np.asarray(min(leaves, key=lambda a: getattr(a, "size", 0)))

        def timed(fn, n=2):
            _force(fn())
            ts = []
            for _ in range(n):
                t0 = time.time()
                _force(fn())
                ts.append(time.time() - t0)
            return float(np.median(ts))

        # every isolated program pays one host<->device round trip; through
        # the remote-TPU tunnel that floor is tens of ms (CLAUDE.md), so
        # report it and subtract it from the derived split.  (The headline
        # qps is immune: the pipelined loop overlaps dispatch.)
        @jax.jit
        def tiny(x):
            return x + 1

        t_floor = _retry(
            lambda: timed(lambda: tiny(jnp.int32(1))), label="phase floor"
        )
        t_enc = _retry(lambda: timed(lambda: enc_fn(params, jids, jmask)), label="phase enc")
        t_model = _retry(lambda: timed(lambda: model_scan(params, jids, jmask)), label="phase model")
        phases = {
            "phase_dispatch_floor_s": round(t_floor, 4),
            "phase_encoder_s": round(max(t_enc - t_floor, 0.0), 4),
            "phase_model_scan_s": round(max(t_model - t_floor, 0.0), 4),
            "phase_constrained_s": round(max(per_batch - t_floor, 0.0), 4),
            "derived_nonmodel_s": round(per_batch - t_model, 4),
        }
    except Exception:
        print("# phase attribution failed; primary metric unaffected", file=sys.stderr)
        traceback.print_exc(limit=3, file=sys.stderr)

    n_keys = sum(len(h) for h in out)
    # BASELINE.md: measured machinery-only upper bound on the reference
    # stack (scripts/bench_reference_anchor.py); 4.52 = generous variant
    baseline_qps = 2.33
    baseline_generous_qps = 4.52

    # ---- BASELINE config 5: serving shape, beam 32 x batch 64 ------------
    # Secondary measurement; failures must not cost the primary metric.
    c5 = {}
    try:
        batch5, beam5 = 64, 32
        queries5 = [
            [0] + rng.integers(4, vocab, size=12).tolist() + [2]
            for _ in range(batch5)
        ]
        ids5, mask5 = pad_batch(queries5, cfg.pad_token_id)

        def run5():
            return fm_index_generate(
                cfg, params, index, ids5, mask5,
                num_beams=beam5, max_length=length, min_length=length - 1,
                forced_bos_token_id=None,
            )

        t0 = time.time()
        out5 = _retry(run5, attempts=3, label="config5 compile+first")
        c5_compile = time.time() - t0
        t5 = []
        for i in range(2):
            t0 = time.time()
            out5 = _retry(run5, attempts=2, label=f"config5 iter {i}")
            t5.append(time.time() - t0)
        per5 = float(np.median(t5))
        flops5 = decode_flops(cfg, batch5, beam5, ids5.shape[1], length)
        c5 = {
            "config5_qps": round(batch5 / per5, 3),
            "config5_mfu": round(flops5 / per5 / peak, 4) if peak else None,
            "config5_keys_per_query": round(sum(len(h) for h in out5) / batch5),
        }
        print(
            f"# config5: beam {beam5} batch {batch5} steady={per5:.2f}s/batch "
            f"compile={c5_compile:.1f}s",
            file=sys.stderr,
        )
    except Exception:
        print("# config5 measurement failed; primary metric unaffected", file=sys.stderr)
        traceback.print_exc(limit=3, file=sys.stderr)

    # ---- max-throughput shape: beam 15, batch 128 -------------------------
    # (per-step overheads amortize with batch; the reference cannot scale
    # this way -- its per-beam host round-trip grows linearly)
    try:
        batch_mx = 128
        queries_mx = [
            [0] + rng.integers(4, vocab, size=12).tolist() + [2]
            for _ in range(batch_mx)
        ]
        ids_mx, mask_mx = pad_batch(queries_mx, cfg.pad_token_id)

        def run_mx():
            return fm_index_generate(
                cfg, params, index, ids_mx, mask_mx,
                num_beams=beam, max_length=length, min_length=length - 1,
                forced_bos_token_id=None,
            )

        _retry(run_mx, attempts=3, label="max-batch compile+first")
        t_mx = []
        for i in range(2):
            t0 = time.time()
            _retry(run_mx, attempts=2, label=f"max-batch iter {i}")
            t_mx.append(time.time() - t0)
        per_mx = float(np.median(t_mx))
        c5["max_batch_qps"] = round(batch_mx / per_mx, 3)
        flops_mx = decode_flops(cfg, batch_mx, beam, ids_mx.shape[1], length)
        c5["max_batch_mfu"] = round(flops_mx / per_mx / peak, 4) if peak else None
        print(f"# max-batch: beam {beam} batch {batch_mx} steady={per_mx:.2f}s/batch",
              file=sys.stderr)
    except Exception:
        print("# max-batch measurement failed; primary metric unaffected", file=sys.stderr)
        traceback.print_exc(limit=3, file=sys.stderr)

    # ---- fast-path fallback observability (VERDICT r3 #8) ----------------
    # How often the round-0 soundness proof failed and the full proposal
    # loop ran during the timed sync decodes (generate.LAST_DECODE_STATS is
    # set by the finalize of the last fm_index_generate call above).
    fallback = {}
    if fallback_stats.get("num_steps"):
        fallback["fallback_rate"] = round(
            fallback_stats["fallback_steps"] / fallback_stats["num_steps"], 4
        )

    # ---- end-to-end batch_search (VERDICT r3 #3) --------------------------
    # Full pipeline on a word-vocab synthetic corpus (the bench_e2e.py
    # recipe, inlined so BENCH_r* always carries it): decode + decomposition
    # + rescore + unigrams + two-stage aggregation + detokenization.
    e2e = {}
    try:
        from seal_tpu.models.tokenizer import WordVocabTokenizer
        from seal_tpu.retrieval.searcher import SEALSearcher

        words = np.array([f"w{i}" for i in range(30_000)])
        probs = 1.0 / np.arange(1, len(words) + 1) ** 0.8
        probs /= probs.sum()
        texts = [
            f"Title{i} @@ " + " ".join(rng.choice(words, size=110, p=probs))
            for i in range(n_docs)
        ]
        tok = WordVocabTokenizer.train((" " + t for t in texts), max_vocab=50_000)
        e2e_docs = [tok.encode_plain(" " + t) + [tok.eos_token_id] for t in texts]
        e2e_index = FMIndex()
        e2e_index.initialize(e2e_docs, labels=[f"d{i}" for i in range(n_docs)])
        # the keygen bench's zipf-corpus logit bias is meaningless over the
        # word-vocab corpus (different id->token mapping) and starves the
        # searcher of corpus-plausible keys; the e2e leg uses the plain
        # seal bias (bench_e2e.py recipe)
        import jax.numpy as jnp

        params_e2e = dict(params)
        params_e2e["final_logits_bias"] = jnp.zeros((cfg.vocab_size,), jnp.float32)
        params_e2e = convert.apply_seal_logits_bias(params_e2e, cfg)
        # Steady-state serving shape: a 2x-batch query stream in batch/2
        # production units, so the producer thread's device work (decode +
        # rescore + unigrams of unit N+1) genuinely overlaps host
        # aggregation of unit N.  The round-4 measurement ran ONE
        # batch-sized unit, where the pipeline has nothing to overlap by
        # construction (phases summed to the wall).
        e2e_bs = max(8, batch // 2)
        searcher = SEALSearcher(
            e2e_index, tok, cfg, params_e2e,
            backbone="word-vocab-large", beam=beam, length=length,
            batch_size=e2e_bs,
        )
        queries = []
        for _ in range(2 * batch):
            d = texts[int(rng.integers(0, n_docs))].split("@@ ")[1].split()
            s = int(rng.integers(0, max(1, len(d) - 6)))
            queries.append(" ".join(d[s : s + 6]))
        _retry(lambda: searcher.batch_search(queries[:e2e_bs], k=10),
               attempts=2, label="e2e warmup")  # compile
        searcher.phase_timer.enabled = True
        t0 = time.time()
        hits = _retry(lambda: searcher.batch_search(queries, k=10),
                      attempts=2, label="e2e steady")
        e2e_wall = time.time() - t0
        tot = searcher.phase_timer.totals
        agg = tot.get("aggregate", 0.0) + tot.get("generate+aggregate", 0.0)
        e2e = {
            "e2e_qps": round(len(queries) / e2e_wall, 3),
            # phases overlap under pipelining: share of wall, not a sum
            "e2e_aggregate_share": round(agg / e2e_wall, 3),
            "e2e_queries": len(queries),
            "e2e_batch_size": e2e_bs,
            **{
                f"e2e_phase_{k}_s": round(v, 3)
                for k, v in sorted(tot.items())
                if k != "generate+aggregate"
            },
        }
        print(
            f"# e2e: {len(queries)} queries in {e2e_wall:.2f}s -> "
            f"{e2e['e2e_qps']} q/s; phases {searcher.phase_timer.summary()}; "
            f"{sum(1 for d_ in hits if d_)}/{len(queries)} non-empty",
            file=sys.stderr,
        )
    except Exception:
        print("# e2e measurement failed; primary metric unaffected", file=sys.stderr)
        traceback.print_exc(limit=3, file=sys.stderr)

    result = {
        "metric": f"constrained key-generation queries/sec/chip (beam {beam}, len {length}, bart-large, {platform})",
        "value": round(qps, 3),
        "unit": "queries/sec",
        "vs_baseline": round(qps / baseline_qps, 2),
        "vs_baseline_generous": round(qps / baseline_generous_qps, 2),
        "baseline_note": "measured reference machinery bound, see BASELINE.md",
        "sync_qps": round(sync_qps, 3),
        "mfu": mfu,
        **phases,
        "model_tflops_per_query": round(flops / batch / 1e12, 3),
        "timed_iters": len(times),
        **fallback,
        **c5,
        **e2e,
    }
    print(json.dumps(result))
    print(
        f"# details: compile={compile_s:.1f}s index_build={build_s:.1f}s "
        f"corpus={len(host)} tokens keys/query={n_keys / batch:.0f} "
        f"steady={per_batch:.2f}s/batch-of-{batch} device={getattr(dev, 'device_kind', '?')} "
        f"index_bytes/token={index.memory_bytes() / len(host):.2f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
