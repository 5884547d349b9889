"""jobs-based multiprocessing aggregation + pipelined search must produce
the same results as the serial path."""

import numpy as np
import pytest

import jax

from seal_tpu.index import FMIndex
from seal_tpu.models import bart
from seal_tpu.models.config import bart_tiny
from seal_tpu.models.tokenizer import WordVocabTokenizer
from seal_tpu.retrieval.searcher import SEALSearcher


@pytest.fixture(scope="module")
def searcher():
    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(60)]
    texts = [
        f"Topic{i} @@ topic{i} " + " ".join(rng.choice(words, size=25)) for i in range(30)
    ]
    tok = WordVocabTokenizer.train([" " + t for t in texts], max_vocab=400)
    docs = [tok.encode_plain(" " + t) + [tok.eos_token_id] for t in texts]
    index = FMIndex()
    index.initialize(docs, labels=[f"t{i}" for i in range(30)])
    cfg = bart_tiny(vocab_size=tok.vocab_size)
    params = bart.init_params(jax.random.PRNGKey(0), cfg)
    return SEALSearcher(
        index, tok, cfg, params,
        backbone="word-vocab", beam=3, length=3, batch_size=2, exact_mask=True,
        decode_titles=False, unigram_scores=False,
    )


def _ranked_ids(results):
    return [[d.docid for d in docs] for docs in results]


def test_jobs_mp_matches_serial(searcher):
    queries = ["topic3 words", "topic7 words", "topic11 words"]
    serial = searcher.batch_search(queries, k=3)
    searcher.jobs = 3
    try:
        parallel = searcher.batch_search(queries, k=3)
    finally:
        searcher.jobs = 1
    assert _ranked_ids(serial) == _ranked_ids(parallel)
    for a, b in zip(serial, parallel):
        for da, db in zip(a, b):
            assert da.score == pytest.approx(db.score)
            # jobs>2 detokenizes in a fork pool -- text must match serial
            assert da.text() == db.text()


def test_pipeline_matches_non_pipeline(searcher):
    queries = ["topic3 words", "topic7 words"]
    searcher.pipeline = False
    try:
        off = searcher.batch_search(queries, k=3)
    finally:
        searcher.pipeline = True
    on = searcher.batch_search(queries, k=3)
    assert _ranked_ids(off) == _ranked_ids(on)


def test_pipeline_propagates_errors(searcher):
    with pytest.raises(Exception):
        # non-string query -> tokenizer error must surface, not hang
        searcher.batch_search([None], k=1)
