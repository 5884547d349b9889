"""Benchmark: constrained key-generation throughput (queries/sec/chip).

Measures the system's hot path -- FM-index-constrained beam search over
BART-large at the reference's NQ operating point (beam 15, body-key length
10, ``/root/reference/README.md:76-83``) -- on a synthetic Wikipedia-scale
slice (10k docs, ~1.2M tokens, BART vocab) with randomly initialized
weights (no network access for checkpoints; throughput is
weight-independent).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` compares against 2.0 queries/sec -- our pinned estimate of
the reference stack's key-generation throughput at the same operating point
(the repo publishes no number, BASELINE.md: per decode step the reference
pays a GPU forward over 300 rows plus a host round-trip through
Python->SWIG->sdsl per beam; ~300-500ms/step x 9 steps / batch 20).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    import seal_tpu  # noqa: F401
    from seal_tpu.decoding.generate import fm_index_generate, pad_batch
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
    index = DeviceFMIndex.from_host(host, vocab=vocab)

    # ---- model: BART-large, bf16 compute ---------------------------------
    cfg = dataclasses.replace(bart_large(), dtype="bfloat16")
    params = bart.init_params(jax.random.PRNGKey(0), cfg)
    params = convert.apply_seal_logits_bias(params, cfg)

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
            forced_bos_token_id=None, top_m=256, window=128,
        )

    t0 = time.time()
    out = run()  # compile + run
    compile_s = time.time() - t0

    n_iters = 3
    t0 = time.time()
    for _ in range(n_iters):
        out = run()
    elapsed = time.time() - t0
    qps = batch * n_iters / elapsed

    n_keys = sum(len(h) for h in out)
    baseline_qps = 2.0  # BASELINE.md: pinned estimate of the reference stack
    result = {
        "metric": f"constrained key-generation queries/sec/chip (beam {beam}, len {length}, bart-large, {platform})",
        "value": round(qps, 3),
        "unit": "queries/sec",
        "vs_baseline": round(qps / baseline_qps, 2),
    }
    print(json.dumps(result))
    print(
        f"# details: compile={compile_s:.1f}s index_build={build_s:.1f}s "
        f"corpus={len(host)} tokens keys/query={n_keys / batch:.0f} "
        f"steady={elapsed / n_iters:.2f}s/batch-of-{batch}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
