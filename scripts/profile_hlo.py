"""Capture a device trace of the constrained decode and print per-HLO-op time.

bench_phases attributes wall time to coarse stages (encoder / model scan /
free-decode selection / constraint ops); this drops to the HLO level: one
``jax.profiler.trace`` around a few steady-state sync decodes at the bench
operating point, parsed with tensorboard_plugin_profile's ``hlo_stats`` tool
into a self-time-ranked op table.  This is the ground truth for the
"unaccounted" share that the analytic selparts/microphases breakdowns miss
(layout changes, fusions, scan bookkeeping).

Usage (real chip; serialize with other TPU jobs):
    python scripts/profile_hlo.py [batch] [beam] [--capture-only]
    python scripts/profile_hlo.py --parse /tmp/seal_hlo_trace   # offline

Prints a table of the top ops by self time plus a category rollup.
"""

import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = os.environ.get("SEAL_TRACE_DIR", "/tmp/seal_hlo_trace")


def capture(batch: int, beam: int) -> str:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from seal_tpu.decoding.generate import fm_index_generate, pad_batch
    from seal_tpu.index import FMIndex
    from seal_tpu.index.device_index import DeviceFMIndex
    from seal_tpu.models import bart, convert
    from seal_tpu.models.api import cast_params
    from seal_tpu.models.config import bart_large

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
    params = dict(bart.init_params(jax.random.PRNGKey(0), cfg))
    unigram = np.bincount(tokens.ravel() % vocab, minlength=vocab).astype(np.float64)
    log_unigram = np.log((unigram + 0.5) / (unigram.sum() + 0.5 * vocab))
    params["final_logits_bias"] = params["final_logits_bias"] + 4.0 * (
        log_unigram - log_unigram.mean()
    ).astype(np.float32)
    params = convert.apply_seal_logits_bias(params, cfg)
    params = jax.device_put(cast_params(cfg, params))

    queries = [[0] + rng.integers(4, vocab, size=12).tolist() + [2] for _ in range(batch)]
    ids, mask = pad_batch(queries, cfg.pad_token_id)

    def run():
        return fm_index_generate(
            cfg, params, index, ids, mask, num_beams=beam, max_length=length,
            min_length=length - 1, forced_bos_token_id=None,
        )

    run()  # compile + warm
    run()
    t0 = time.perf_counter()
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            run()
    wall = time.perf_counter() - t0
    print(f"# captured 3 decodes in {wall:.2f}s -> {TRACE_DIR}", file=sys.stderr)
    return TRACE_DIR


def parse(trace_dir: str, top: int = 40):
    from xprof.convert import raw_to_tool_data

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    # hlo_stats: per-HLO self time on the device timeline
    data, _ = raw_to_tool_data.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    obj = json.loads(data)
    # gviz-style table: first element holds cols/rows
    tbl = obj[0] if isinstance(obj, list) else obj
    cols = [c["label"] if isinstance(c, dict) else c for c in tbl["cols"]]
    rows = [[c["v"] if isinstance(c, dict) else c for c in r["c"]] for r in tbl["rows"]]

    def col(name_sub):
        for i, c in enumerate(cols):
            if name_sub.lower() in str(c).lower():
                return i
        raise KeyError(f"{name_sub} not in {cols}")

    i_cat = col("category")
    i_name = col("hlo op name")
    i_self = col("total self time (us)")
    i_expr = None
    for cand in ("framework op name",):
        try:
            i_expr = col(cand)
            break
        except KeyError:
            pass
    try:
        i_bound = col("bound by")
    except KeyError:
        i_bound = None
    try:
        i_bw = col("measured memory bw")
    except KeyError:
        i_bw = None

    total = sum(float(r[i_self]) for r in rows)
    by_cat = {}
    for r in rows:
        by_cat[r[i_cat]] = by_cat.get(r[i_cat], 0.0) + float(r[i_self])
    print(f"total device self time: {total/1e6:.4f} s (3 decodes)")
    print("\n-- category rollup --")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{v/1e3:10.2f} ms  {100*v/total:5.1f}%  {k}")
    print(f"\n-- top {top} ops by self time --")
    agg = {}
    meta = {}
    for r in rows:
        key = (r[i_cat], str(r[i_name])[:110])
        agg[key] = agg.get(key, 0.0) + float(r[i_self])
        if key not in meta:
            meta[key] = (
                str(r[i_expr]) if i_expr is not None else "",
                str(r[i_bound]) if i_bound is not None else "",
                str(r[i_bw]) if i_bw is not None else "",
            )
    for (cat, name), v in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        fw, bound, bw = meta[(cat, name)]
        print(
            f"{v/1e3:10.2f} ms  {100*v/total:5.1f}%  [{cat}] {name}"
            f"  bound_by={bound} bw={bw} GiB/s"
        )
        if fw:
            print(f"               {fw[:220]}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    if "--parse" in args:
        parse(args[args.index("--parse") + 1])
    else:
        batch = int(args[0]) if len(args) > 0 and not args[0].startswith("-") else 32
        beam = int(args[1]) if len(args) > 1 and not args[1].startswith("-") else 15
        d = capture(batch, beam)
        if "--capture-only" not in args:
            parse(d)
