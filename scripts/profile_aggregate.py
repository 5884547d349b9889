"""Host-only cProfile of aggregate_evidence at the e2e bench's operating
point (10k-doc zipf corpus, bart-free synthetic keys shaped like beam-15
decode output + query decomposition).  No device work: this isolates the
host aggregate phase that BASELINE.md's e2e table pins at ~3.5 s / 32
queries on the 1-core VM.
"""

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from seal_tpu.index import FMIndex
from seal_tpu.scoring import keys as rk


def main():
    rng = np.random.default_rng(0)
    n_docs = 10_000
    vocab = 50_000
    t0 = time.time()
    probs = 1.0 / np.arange(1, vocab - 10 + 1) ** 0.8
    probs /= probs.sum()
    docs = [
        (rng.choice(vocab - 10, size=110, p=probs) + 10).tolist() + [2]
        for _ in range(n_docs)
    ]
    index = FMIndex()
    index.initialize(docs, labels=[f"d{i}" for i in range(n_docs)])
    print(f"# index: {time.time()-t0:.1f}s ({len(index)} tokens)", file=sys.stderr)

    # synthetic per-query keys: ~35 ngrams (beam 15 * title/body variants +
    # decomposition 3-grams), spans lifted from random docs, scores in the
    # rescorer's typical range
    def make_keys():
        out = []
        for _ in range(35):
            d = docs[int(rng.integers(0, n_docs))]
            s = int(rng.integers(0, 100))
            L = int(rng.integers(3, 11))
            out.append((d[s : s + L], float(-rng.random() * 4)))
        return out

    all_keys = [make_keys() for _ in range(32)]
    uni = (-rng.random(vocab) * 8).tolist()

    def run_all(collect_found=False):
        for kk in all_keys:
            rk.aggregate_evidence(
                ngrams_and_scores=kk,
                unigram_scores=uni,
                index=index,
                max_occurrences_1=1500,
                n_docs_complete_score=500,
                collect_found=collect_found,
            )

    run_all()  # warm native build
    t0 = time.time()
    run_all()
    print(f"# aggregate: {time.time()-t0:.2f}s / 32 queries", file=sys.stderr)

    pr = cProfile.Profile()
    pr.enable()
    run_all()
    pr.disable()
    pstats.Stats(pr, stream=sys.stderr).sort_stats("cumulative").print_stats(30)


if __name__ == "__main__":
    main()
