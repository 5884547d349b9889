"""Unit tests for key scoring and evidence aggregation."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seal_tpu.index import FMIndex
from seal_tpu.models import bart
from seal_tpu.models.config import bart_tiny
from seal_tpu.scoring import keys as rk


def test_strip():
    assert rk.strip([0, 2, 5, 6, 2], [0, 2], [2]) == [5, 6]
    assert rk.strip([5, 6], [0], [1]) == [5, 6]
    assert rk.strip([0, 0, 0], [0], [0]) == []


def test_deduplicate():
    xs = [[1, 2], [1, 2], [3], (1, 2), [3, 1]]
    assert rk.deduplicate(xs) == [[1, 2], [3], [3, 1]]
    scored = [(0.5, [1, 2]), (0.9, [1, 2]), (0.1, [3])]
    assert rk.deduplicate(scored) == [(0.5, [1, 2]), (0.1, [3])]


def test_decompose_query_into_keys():
    out = rk.decompose_query_into_keys("eat soup", length=2)
    # spans: [eat], [soup], [eat soup]; each in all capitalizations, with
    # leading space (keys.py:43-50)
    assert " eat soup" in out
    assert " Eat Soup" in out
    assert " soup" in out and " Soup" in out
    assert all(s.startswith(" ") for s in out)
    assert len(out) == 2 + 2 + 4


def test_log_odds_score_hand_computed():
    # sr = log LM prob, count/ntokens give snr; formula keys.py:216-227
    sr, count, ntokens, smoothing, alpha = -1.0, 10, 10000.0, 5.0, 2.0
    snr = math.log((count + smoothing) / (ntokens + smoothing))
    expect = ((sr - 1e-10) + math.log(1 - math.exp(snr))) - (
        snr + math.log(1 - math.exp(sr - 1e-10))
    )
    expect = max(expect, 0.0) ** alpha
    got = rk._log_odds_score(sr, count, ntokens, smoothing, alpha, 0.0, 3)
    assert got == pytest.approx(expect, rel=1e-9)
    # higher corpus frequency => lower score
    lo = rk._log_odds_score(-1.0, 1000, ntokens, smoothing, alpha, 0.0, 3)
    assert lo < got
    # hopeless LM prob => clamped to 0
    assert rk._log_odds_score(-30.0, 9000, 10000.0, 5.0, 2.0, 0.0, 2) == 0.0


@pytest.fixture(scope="module")
def model():
    cfg = bart_tiny(vocab_size=50)
    params = bart.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_rescore_keys_matches_manual(model):
    cfg, params = model
    inputs = [[0, 7, 8, 2], [0, 9, 2]]
    keys = [[[5, 6], (0.1, [7])], [[8, 9, 10]]]
    out = rk.rescore_keys(cfg, params, inputs, keys)
    assert len(out) == 2 and len(out[0]) == 2 and len(out[1]) == 1

    # manual: teacher-forced logprob of [start] + key
    @jax.jit
    def _lp(ids, mask, dec):
        enc = bart.encode(cfg, params, ids, mask)
        logits = bart.decode_full(cfg, params, enc, mask, dec[:, :-1])
        return jax.nn.log_softmax(logits, -1)

    def manual(inp, key):
        ids = np.array([inp])
        mask = np.ones_like(ids)
        dec = np.array([[cfg.decoder_start_token_id] + key])
        lp = np.asarray(_lp(jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(dec)))
        return sum(float(lp[0, t, tok]) for t, tok in enumerate(key) if tok >= 2)

    assert out[0][0][0] == pytest.approx(manual([0, 7, 8, 2], [5, 6]), abs=2e-3)
    assert out[0][1][0] == pytest.approx(manual([0, 7, 8, 2], [7]), abs=2e-3)
    assert out[0][1][1] == [7]  # (score, key) pairs get rescored, key kept
    assert out[1][0][0] == pytest.approx(manual([0, 9, 2], [8, 9, 10]), abs=2e-3)


def test_rescore_keys_empty(model):
    cfg, params = model
    out = rk.rescore_keys(cfg, params, [[0, 5, 2]], [[]])
    assert out == [[]]


def test_compute_unigram_scores(model):
    cfg, params = model
    lp = rk.compute_unigram_scores(cfg, params, [[0, 7, 2], [0, 9, 2]], tolist=False)
    assert lp.shape == (2, 50)
    np.testing.assert_allclose(np.exp(lp).sum(-1), 1.0, atol=1e-5)


@pytest.fixture(scope="module")
def toy_index():
    # doc0 mentions "5 6 7" uniquely; doc1/2 share other ngrams
    docs = [
        [5, 6, 7, 10, 11, 2],
        [10, 11, 12, 13, 2],
        [12, 13, 10, 11, 2],
    ]
    index = FMIndex()
    index.initialize(docs, labels=["d0", "d1", "d2"])
    return index, docs


def test_aggregate_evidence_unique_ngram_wins(toy_index):
    index, docs = toy_index
    results, ngrams = rk.aggregate_evidence(
        [([5, 6, 7], -0.5), ([10, 11], -2.0)],
        unigram_scores=None,
        index=index,
    )
    assert list(results)[0] == 0  # doc0 holds the strong unique key
    sco0 = results[0][0]
    assert sco0 > 0
    # matched ngrams recorded for doc0 include the unique key
    assert any(tuple(n) == (5, 6, 7) for n, _ in results[0][1])
    # every doc that got scored has doc_tokens = [2] + doc[:-1]
    # (an np view in the native path; list() normalizes)
    for doc_idx, info in results.items():
        assert list(info[3]) == [2] + docs[doc_idx][:-1]


def test_aggregate_evidence_zero_count_keys_dropped(toy_index):
    index, _ = toy_index
    results, ngrams = rk.aggregate_evidence(
        [([40, 41], -0.5)], unigram_scores=None, index=index
    )
    assert ngrams == {}
    assert results == {}


def test_aggregate_evidence_repetition_penalty(toy_index):
    index, _ = toy_index
    # two overlapping keys in doc1/2: the second's contribution is damped by
    # the coverage coefficient 1-beta+beta*|new|/|ngram|
    res_b0, _ = rk.aggregate_evidence(
        [([10, 11], -0.5), ([11, 12], -0.6)], index=index, beta=0.0
    )
    res_b1, _ = rk.aggregate_evidence(
        [([10, 11], -0.5), ([11, 12], -0.6)], index=index, beta=0.8
    )
    # with beta=0 no penalty -> scores should be >= the penalized ones
    for doc in res_b1:
        if doc in res_b0:
            assert res_b0[doc][0] >= res_b1[doc][0] - 1e-9


def test_aggregate_evidence_unigram_fallback(toy_index):
    index, docs = toy_index
    V = 20
    unigram_scores = [-10.0] * V
    unigram_scores[7] = -0.05  # token 7 only in doc0
    results, _ = rk.aggregate_evidence(
        [([10, 11], -1.0)],
        unigram_scores=unigram_scores,
        index=index,
        use_top_k_unigrams=3,
        add_best_unigrams_to_ngrams=True,
    )
    assert 0 in results
    matched0 = [tuple(n) for n, _ in results[0][1]]
    assert (7,) in matched0
