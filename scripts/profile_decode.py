"""Op-level attribution of the REAL constrained-decode program on device.

bench_microphases times fm-ops in synthetic scans; this instead traces the
actual ``fm_index_generate`` program (bench.py operating point) with
``jax.profiler.trace`` and aggregates the device-side chrome-trace events
by XLA op family.  No tensorboard/tensorflow needed: the trace.json.gz the
profiler writes is plain chrome-trace JSON.

Usage: python scripts/profile_decode.py [batch] [beam] [length]
Prints a per-family table (total ms across the traced iteration, count,
top source ops) and one JSON line with the top families.
"""

import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_setup(batch, beam, length):
    import dataclasses

    import jax

    from seal_tpu.decoding.generate import fm_index_generate, pad_batch
    from seal_tpu.index import FMIndex
    from seal_tpu.index.device_index import DeviceFMIndex
    from seal_tpu.models import bart, convert
    from seal_tpu.models.config import bart_large

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

    return run


FAMILY_PAT = re.compile(r"^([a-zA-Z_\-]+)")


def aggregate(trace_path):
    with gzip.open(trace_path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pid/tid metadata names mentioning TPU / device XLA ops
    name_of_pid = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name_of_pid[e["pid"]] = e.get("args", {}).get("name", "")
    fams = defaultdict(lambda: [0.0, 0, defaultdict(float)])
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = name_of_pid.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        m = FAMILY_PAT.match(name)
        fam = m.group(1).rstrip(".-_") if m else name
        fams[fam][0] += dur
        fams[fam][1] += 1
        fams[fam][2][name] += dur
        total += dur
    return fams, total, name_of_pid


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    beam = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    length = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    import jax

    run = build_setup(batch, beam, length)
    t0 = time.time()
    run()  # compile + warm
    print(f"# compile+warm {time.time()-t0:.0f}s", file=sys.stderr)
    t0 = time.time()
    run()
    steady = time.time() - t0
    print(f"# steady {steady*1e3:.0f} ms/batch", file=sys.stderr)

    log_dir = "/tmp/jaxprof_decode"
    os.system(f"rm -rf {log_dir}")
    with jax.profiler.trace(log_dir):
        run()

    traces = sorted(glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True))
    if not traces:
        print(json.dumps({"error": "no trace produced", "dir": log_dir}))
        return
    fams, total, pids = aggregate(traces[-1])
    rows = sorted(fams.items(), key=lambda kv: -kv[1][0])
    print(f"# lanes: {sorted(set(pids.values()))}", file=sys.stderr)
    print(f"{'family':<28}{'ms':>9}{'n':>7}  top ops")
    for fam, (ms, n, named) in rows[:24]:
        top = sorted(named.items(), key=lambda kv: -kv[1])[:2]
        tops = ", ".join(f"{k}:{v:.1f}" for k, v in top)
        print(f"{fam:<28}{ms:9.2f}{n:7d}  {tops[:80]}")
    out = {
        "batch": batch, "beam": beam, "length": length,
        "steady_ms_per_batch": round(steady * 1e3, 1),
        "device_total_ms": round(total, 2),
        "top": {fam: round(v[0], 2) for fam, v in rows[:12]},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
