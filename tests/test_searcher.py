"""End-to-end searcher tests on a toy natural-language corpus with the
word-vocab tokenizer and a tiny random-weight BART.

Retrieval quality here comes from the query-decomposition keys (exact corpus
matches) -- the random LM contributes noise but the FM-index grounding and
the log-odds scorer must still surface the right document.
"""

import numpy as np
import pytest

import jax

from seal_tpu.index import FMIndex
from seal_tpu.models import bart
from seal_tpu.models.config import bart_tiny
from seal_tpu.models.tokenizer import WordVocabTokenizer
from seal_tpu.retrieval.searcher import SEALSearcher

CORPUS = [
    ("d0", "Soup", "You can eat soup with a spoon but eating soup with a fork is hard."),
    ("d1", "Forks", "A fork is a utensil with tines used for spearing solid food."),
    ("d2", "Bicycles", "A bicycle has two wheels and is propelled by pedals."),
    ("d3", "Rivers", "A river is a natural stream of fresh water flowing toward an ocean."),
    ("d4", "Chess", "Chess is a board game for two players with sixteen pieces each."),
]


@pytest.fixture(scope="module")
def searcher():
    # filler docs push ntokens up so rare keys beat the corpus-frequency
    # prior in the log-odds score (with ~100 tokens everything clamps to 0)
    rng = np.random.default_rng(0)
    filler_words = [f"word{i}" for i in range(80)]
    filler = [
        (
            f"f{i}",
            f"Filler{i}",
            " ".join(rng.choice(filler_words, size=30)),
        )
        for i in range(20)
    ]
    corpus = CORPUS + filler
    texts = [f"{title} @@ {body}" for _, title, body in corpus]
    tok = WordVocabTokenizer.train([" " + t for t in texts], max_vocab=500)
    docs = [tok.encode_plain(" " + t) + [tok.eos_token_id] for t in texts]
    index = FMIndex()
    index.initialize(docs, labels=[d for d, _, _ in corpus])
    cfg = bart_tiny(vocab_size=tok.vocab_size)
    params = bart.init_params(jax.random.PRNGKey(0), cfg)
    # deterministic "LM": boost tokens of the real (non-filler) docs so that
    # query-span keys carry LM evidence above the corpus-frequency prior;
    # ranking then comes from where those keys occur (the machinery under test)
    import jax.numpy as jnp

    bias = np.zeros(cfg.vocab_size, np.float32)
    for _, title, body in CORPUS:
        for t in tok.encode_plain(" " + title + " " + body.lower()) + tok.encode_plain(
            " " + body
        ):
            bias[t] = 8.0
    params = dict(params)
    params["final_logits_bias"] = jnp.asarray(bias)
    return SEALSearcher(
        index,
        tok,
        cfg,
        params,
        backbone="word-vocab",
        beam=4,
        length=4,
        batch_size=4,
        exact_mask=True,
        decode_body=False,  # ranking tests use query-decomposition keys only
        decode_titles=False,  # (generation paths covered by grounding tests)
        unigram_scores=False,
        progress=False,
    )


def test_search_finds_right_doc(searcher):
    docs = searcher.search("eating soup with a fork", k=3)
    assert docs
    assert docs[0].docid == "d0"
    title, body = docs[0].text()
    assert "Soup" in title
    assert "soup" in body


def test_search_other_topic(searcher):
    docs = searcher.search("two wheels pedals bicycle", k=2)
    assert docs[0].docid == "d2"


def test_batch_search_multiple_queries(searcher):
    searcher.metrics.reset()
    res = searcher.batch_search(
        ["fresh water river ocean", "chess board game"], k=2
    )
    assert res[0][0].docid == "d3"
    assert res[1][0].docid == "d4"
    snap = searcher.metrics.snapshot()
    assert snap["queries"] == 2 and snap["batches"] == 1
    assert snap["docs_returned"] == sum(len(d) for d in res)
    assert snap["keys_generated"] > 0 and snap["queries_per_s"] > 0
    assert any(k.startswith("phase_") for k in snap)


def test_include_keys(searcher):
    searcher.include_keys = True
    try:
        docs = searcher.search("eating soup with a fork", k=1)
        assert docs[0].keys
        # keys are (text, corpus_count, score) triples
        text, count, score = docs[0].keys[0]
        assert isinstance(text, str) and count > 0
    finally:
        searcher.include_keys = False


def test_doc_accessor(searcher):
    d = searcher.doc("d1")
    assert d.docid == "d1"
    title, body = d.text()
    assert "Forks" in title


def test_generate_keys_are_grounded(searcher):
    searcher.decode_body = True
    searcher.unigram_scores = True
    try:
        keys, us = searcher.generate_keys("eat soup with a fork")
        assert keys
        for ngram, score in keys:
            assert searcher.fm_index.get_count(list(ngram)) > 0
        assert len(us) == searcher.model_cfg.vocab_size
    finally:
        searcher.decode_body = False
        searcher.unigram_scores = False


def test_title_decoding_path(searcher):
    # enable title decode: title keys are [eos, Title tokens..., @@]
    searcher.decode_titles = True
    try:
        keys = searcher.generate_keys("soup with a fork")
        for ngram, score in keys:
            assert searcher.fm_index.get_count(list(ngram)) > 0
    finally:
        searcher.decode_titles = False


def test_free_generation_mode(searcher):
    searcher.free_generation = True
    try:
        docs = searcher.search("eating soup with a fork", k=2)
        assert docs  # ungrounded keys are filtered; decomposition still works
        assert docs[0].docid == "d0"
    finally:
        searcher.free_generation = False


def test_index_layout_knobs_are_result_identical(searcher):
    """compact_index / hybrid_index swap the device layout without changing
    a single ranked result (bit-exact constraint semantics across layouts)."""
    from seal_tpu.index.wavelet import WaveletFMIndex

    queries = ["eating soup with a fork", "two wheels pedals bicycle"]
    want = [
        [(d.docid, round(d.score, 6)) for d in docs]
        for docs in searcher.batch_search(queries, k=3)
    ]
    for knob in ({"compact_index": True}, {"hybrid_index": True}):
        s2 = SEALSearcher(
            searcher.fm_index,
            searcher.tokenizer,
            searcher.model_cfg,
            searcher.params,
            backbone="word-vocab",
            beam=4,
            length=4,
            batch_size=4,
            exact_mask=True,
            decode_body=False,
            decode_titles=False,
            unigram_scores=False,
            progress=False,
            **knob,
        )
        assert isinstance(s2.device_index, WaveletFMIndex)
        assert (s2.device_index.bwt is not None) == knob.get("hybrid_index", False)
        got = [
            [(d.docid, round(d.score, 6)) for d in docs]
            for docs in s2.batch_search(queries, k=3)
        ]
        assert got == want, knob
