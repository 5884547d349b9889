"""Adversarial fallback benchmark: fallback_rate + q/s cost when it fires.

``bench.py`` reports ``fallback_rate`` 0.0 at the trained operating point
(corpus-unigram-biased logits): the round-0 proposal set always proves
complete.  This script measures the OTHER end -- the LM-averse,
few-continuation workload the host-deferred exactness fallback exists for
(the class ``tests/test_exact_proposals.py`` fuzzes at toy scale), at the
bench operating point:

* corpus drawn from only ``n_corpus_tokens`` distinct ids (default 512) so
  every interval has few distinct continuations but many rows;
* ``final_logits_bias`` pushed AWAY from the corpus band and toward tokens
  that never occur, so the exact top-``chunk`` LM sweep proposes invalid
  tokens and the round-0 completeness proof fails.

When a step's proof fails, ``fm_index_generate`` re-dispatches the whole
scan with ``force_full=True`` (decoding/constrained.py: deferred exactness
fallback), so the cost model is ~2x a decode plus the full proposal loop's
extra rounds.  Output: ONE JSON line with the measured fallback_rate, the
sync q/s with fallbacks firing, and the same-corpus q/s with the trained
(corpus-biased) logits for the cost ratio.

Run on the real chip: python scripts/bench_adversarial.py [batch] [beam]
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp  # noqa: F401  (device init)

    from seal_tpu.decoding.generate import LAST_DECODE_STATS, fm_index_generate, pad_batch
    from seal_tpu.index import FMIndex
    from seal_tpu.index.device_index import DeviceFMIndex
    from seal_tpu.models import bart, convert
    from seal_tpu.models.api import cast_params
    from seal_tpu.models.config import bart_large

    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(argv[0]) if len(argv) > 0 else 32
    beam = int(argv[1]) if len(argv) > 1 else 15
    length = 10
    # two adversary bands: 512 (few-continuation intervals -- the slab
    # covers these) and 8192 (more distinct continuations than window+chunk
    # can enumerate per round, forcing the completeness proof to work)
    bands = [512, 8192]

    rng = np.random.default_rng(0)
    n_docs, doc_len, vocab = 10_000, 120, 50265
    cfg = dataclasses.replace(bart_large(), dtype="bfloat16")
    params0 = dict(bart.init_params(jax.random.PRNGKey(0), cfg))

    for n_band in bands:
        zipf = rng.zipf(1.3, size=n_docs * doc_len)
        tokens = (zipf % n_band + 4).astype(np.int64).reshape(n_docs, doc_len)
        docs = [row.tolist() + [2] for row in tokens]
        host = FMIndex()
        host.initialize(docs)
        index = DeviceFMIndex.from_host(host, vocab=vocab)

        unigram = np.bincount(tokens.ravel() % vocab, minlength=vocab).astype(np.float64)
        log_unigram = np.log((unigram + 0.5) / (unigram.sum() + 0.5 * vocab))
        centered = (log_unigram - log_unigram.mean()).astype(np.float32)

        queries = [
            [0] + rng.integers(4, n_band, size=12).tolist() + [2]
            for _ in range(batch)
        ]
        ids, mask = pad_batch(queries, cfg.pad_token_id)

        def build(sign):
            p = dict(params0)
            p["final_logits_bias"] = p["final_logits_bias"] + sign * centered
            p = convert.apply_seal_logits_bias(p, cfg)
            return cast_params(cfg, p)

        results = {}
        for label, sign in (("trained", 4.0), ("adversarial", -4.0)):
            params = build(sign)

            def run():
                return fm_index_generate(
                    cfg, params, index, ids, mask,
                    num_beams=beam, max_length=length, min_length=length - 1,
                    forced_bos_token_id=None,
                )

            run()  # compile + warm (shared executable across signs)
            times = []
            rates = []
            for _ in range(3):
                t0 = time.time()
                run()
                times.append(time.time() - t0)
                if LAST_DECODE_STATS.get("num_steps"):
                    rates.append(
                        LAST_DECODE_STATS["fallback_steps"]
                        / LAST_DECODE_STATS["num_steps"]
                    )
            per = float(np.median(times))
            results[label] = {
                "qps": round(batch / per, 3),
                "s_per_batch": round(per, 4),
                "fallback_rate": round(float(np.median(rates)), 4) if rates else None,
            }
            print(f"# band={n_band} {label}: {results[label]}", file=sys.stderr)

        adv, ref = results["adversarial"], results["trained"]
        print(json.dumps({
            "metric": "adversarial fallback cost (LM-averse corpus)",
            "adv_fallback_rate": adv["fallback_rate"],
            "adv_qps": adv["qps"],
            "same_corpus_trained_qps": ref["qps"],
            "trained_fallback_rate": ref["fallback_rate"],
            "qps_cost_ratio": round(ref["qps"] / adv["qps"], 3) if adv["qps"] else None,
            "batch": batch, "beam": beam, "n_corpus_tokens": n_band,
        }), flush=True)


if __name__ == "__main__":
    main()
