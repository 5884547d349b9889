"""Large-corpus key-generation benchmark (toward the full-Wikipedia config).

Builds a synthetic corpus of N tokens (default 100M) with a Zipf token
distribution at BART vocab, ships the decode-path index to the chip, and
measures constrained key generation at the reference operating point
(beam 15, length 10, batch 32).  Usage:

    python scripts/bench_scale.py [n_tokens] [--compact] [--t5]

``--t5`` swaps the backbone for T5-base (32k vocab, same corpus recipe at
that vocab) -- the reproducible home of the BASELINE.md "second model
family" throughput row.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from seal_tpu.decoding.generate import fm_index_generate, pad_batch
    from seal_tpu.index import FMIndex
    from seal_tpu.index.device_index import DeviceFMIndex
    from seal_tpu.models import bart, convert
    from seal_tpu.models.config import bart_large
    import dataclasses

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_tokens = int(float(args[0])) if args else 100_000_000
    compact = "--compact" in sys.argv
    use_t5 = "--t5" in sys.argv
    doc_len, vocab = 120, (32128 if use_t5 else 50265)
    n_docs = n_tokens // (doc_len + 1)

    rng = np.random.default_rng(0)
    t0 = time.time()
    zipf = rng.zipf(1.3, size=n_docs * doc_len)
    body = (zipf % (vocab - 10) + 4).astype(np.int32).reshape(n_docs, doc_len)
    flat = np.concatenate(
        [body, np.full((n_docs, 1), 2, np.int32)], axis=1
    ).ravel()
    gen_s = time.time() - t0

    t0 = time.time()
    host = FMIndex()
    host.initialize_from_arrays(flat, np.full(n_docs, doc_len + 1, np.int64))
    build_s = time.time() - t0

    t0 = time.time()
    if compact:
        from seal_tpu.index.wavelet import WaveletFMIndex

        index = WaveletFMIndex.from_host(host, vocab=vocab)
    else:
        index = DeviceFMIndex.from_host(host, vocab=vocab)
    ship_s = time.time() - t0
    mem = index.memory_bytes()

    if use_t5:
        from seal_tpu.models import t5 as t5mod
        from seal_tpu.models.t5 import T5Config

        cfg = T5Config(
            vocab_size=vocab, d_model=768, d_kv=64, d_ff=3072,
            num_layers=12, num_heads=12, dtype="bfloat16",
        )  # t5-base
        params = dict(t5mod.init_params(jax.random.PRNGKey(0), cfg))
        # same corpus-unigram workload shaping as the BART leg, via the
        # optional final_logits_bias t5.lm_logits honors (HF T5 has none;
        # random weights spread proposal mass uniformly, an operating
        # point no trained model exhibits)
        unigram = np.bincount(body.ravel() % vocab, minlength=vocab).astype(np.float64)
        log_u = np.log((unigram + 0.5) / (unigram.sum() + 0.5 * vocab))
        import jax.numpy as jnp

        params["final_logits_bias"] = jnp.asarray(
            4.0 * (log_u - log_u.mean()).astype(np.float32)
        )
    else:
        cfg = dataclasses.replace(bart_large(), dtype="bfloat16")
        params = dict(bart.init_params(jax.random.PRNGKey(0), cfg))
        unigram = np.bincount(body.ravel() % vocab, minlength=vocab).astype(np.float64)
        log_u = np.log((unigram + 0.5) / (unigram.sum() + 0.5 * vocab))
        params["final_logits_bias"] = params["final_logits_bias"] + 4.0 * (
            log_u - log_u.mean()
        ).astype(np.float32)
        params = convert.apply_seal_logits_bias(params, cfg)
    from seal_tpu.models.api import cast_params

    params = cast_params(cfg, params)  # bf16 weight copies, as bench.py

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
    out = run()
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        out = run()
        times.append(time.time() - t0)
    per = float(np.median(times))
    print(
        f"# corpus={len(host)} tokens ({n_docs} docs) gen={gen_s:.0f}s "
        f"sa-is+derive={build_s:.0f}s ship={ship_s:.0f}s compile={compile_s:.0f}s",
        file=sys.stderr,
    )
    mode = ("compact" if compact else "fast") + (" t5-base" if use_t5 else "")
    print(
        f"scale bench ({mode}): {batch / per:.1f} q/s at beam {beam} len {length} "
        f"batch {batch}; index {mem / 2**30:.2f} GiB on-chip "
        f"({mem / len(host):.2f} B/token); keys/query "
        f"{sum(len(h) for h in out) / batch:.0f}"
    )


if __name__ == "__main__":
    main()
