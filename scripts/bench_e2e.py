"""End-to-end search benchmark (secondary; the driver's headline metric is
bench.py).  Full SEALSearcher.batch_search on a synthetic 10k-doc corpus
with BART-large: constrained generation + query decomposition + rescoring +
unigram scores + two-stage aggregation + detokenization.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from seal_tpu.index import FMIndex
    from seal_tpu.models import bart, convert
    from seal_tpu.models.config import bart_large
    from seal_tpu.models.tokenizer import WordVocabTokenizer
    from seal_tpu.retrieval.searcher import SEALSearcher
    import dataclasses

    rng = np.random.default_rng(0)
    n_docs = 10_000
    words = np.array([f"w{i}" for i in range(30_000)])
    probs = 1.0 / np.arange(1, len(words) + 1) ** 0.8
    probs /= probs.sum()

    def make_text(n):
        return " ".join(rng.choice(words, size=n, p=probs))

    texts = [f"Title{i} @@ {make_text(110)}" for i in range(n_docs)]
    t0 = time.time()
    tok = WordVocabTokenizer.train((" " + t for t in texts), max_vocab=50_000)
    docs = [tok.encode_plain(" " + t) + [tok.eos_token_id] for t in texts]
    index = FMIndex()
    index.initialize(docs, labels=[f"d{i}" for i in range(n_docs)])
    print(f"# index build: {time.time()-t0:.1f}s ({len(index)} tokens)", file=sys.stderr)

    cfg = dataclasses.replace(bart_large(), dtype="bfloat16")
    params = bart.init_params(jax.random.PRNGKey(0), cfg)
    params = convert.apply_seal_logits_bias(params, cfg)
    from seal_tpu.models.api import cast_params

    params = cast_params(cfg, params)  # bf16 weight copies, as bench.py

    searcher = SEALSearcher(
        index, tok, cfg, params,
        backbone="word-vocab-large", beam=15, length=10,
        batch_size=int(os.environ.get("BENCH_E2E_BATCH", "32")),
        progress=True,
    )
    # queries: spans lifted from random docs (so decomposition keys hit)
    queries = []
    for _ in range(32):
        d = texts[int(rng.integers(0, n_docs))].split("@@ ")[1].split()
        s = int(rng.integers(0, max(1, len(d) - 6)))
        queries.append(" ".join(d[s : s + 6]))

    t0 = time.time()
    out = searcher.batch_search(queries[:16], k=10)  # warmup/compile
    warm = time.time() - t0
    searcher.phase_timer.enabled = True  # fine-grained split of the steady run
    t0 = time.time()
    out = searcher.batch_search(queries, k=10)
    elapsed = time.time() - t0
    hits = sum(1 for docs_ in out if docs_)
    print(
        f"# warmup {warm:.1f}s; steady {elapsed:.2f}s for {len(queries)} queries "
        f"-> {len(queries)/elapsed:.2f} q/s end-to-end; {hits}/{len(queries)} non-empty",
        file=sys.stderr,
    )
    # phases overlap under pipelining (decode in a producer thread), so
    # these are shares of where time is spent, not a wall-clock sum
    print(f"# phases: {searcher.phase_timer.summary()}", file=sys.stderr)

    if os.environ.get("BENCH_E2E_PROFILE"):
        # host-only profile of the dominant aggregate phase on real keys
        import cProfile
        import pstats

        keys = list(searcher.batch_generate_keys(queries))
        pr = cProfile.Profile()
        pr.enable()
        for kk in keys:
            searcher.retrieve_from_keys(kk)
        pr.disable()
        pstats.Stats(pr, stream=sys.stderr).sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    main()
