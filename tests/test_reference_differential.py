"""Differential parity against the GENUINE reference implementation.

Round-1 parity rested on a hand-written mirror (tests/reference_impl.py) --
same author, same potential misreadings.  These tests import the actual
reference sources from /root/reference (read-only) and run them against the
repo's host FMIndex (duck-typed: the reference only consumes the query API),
then assert our implementations produce identical results:

* ``seal/keys.py:aggregate_evidence``  vs  ``seal_tpu.scoring.keys`` -- the
  ~350-line order-sensitive two-stage ranker, fuzzed over random corpora,
  key sets, and knob combinations.
* ``seal/beam_search.py:IndexBasedLogitsProcessor`` vs our fused candidate
  branches (dense parity mode) -- allowed-token sets per beam state across
  the step-1 / finished / stop_at_count / force_decoding_from /
  always_allow_eos regimes.

The reference modules import ``seal`` and (old-API) ``transformers``
symbols; both are satisfied with stubs before exec -- no reference code is
copied, only executed.
"""

import importlib.util
import math
import os
import sys
import types

import numpy as np
import pytest

from seal_tpu.index.fm_index import FMIndex
from seal_tpu.scoring import keys as our_keys

REF = "/root/reference/seal"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not mounted"
)


def _load_module(name, path, extra_stubs=()):
    """Exec a reference module with `seal` (and optional extras) stubbed."""
    saved = {}
    stubs = {}
    seal_stub = types.ModuleType("seal")
    seal_stub.FMIndex = FMIndex
    seal_index_stub = types.ModuleType("seal.index")
    seal_index_stub.FMIndex = FMIndex
    stubs["seal"] = seal_stub
    stubs["seal.index"] = seal_index_stub
    for mod_name, mod in extra_stubs:
        stubs[mod_name] = mod
    try:
        for k, v in stubs.items():
            saved[k] = sys.modules.get(k)
            sys.modules[k] = v
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        for k, old in saved.items():
            if old is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = old


_cache = {}


def ref_keys():
    if "keys" not in _cache:
        _cache["keys"] = _load_module("ref_seal_keys", f"{REF}/keys.py")
    return _cache["keys"]


def ref_beam_search():
    if "bs" not in _cache:
        # the reference pins transformers==4.13; satisfy its import surface
        # with inert stand-ins (only LogitsProcessor is actually inherited)
        tf = types.ModuleType("transformers")
        for cls in (
            "LogitsProcessor",
            "BeamScorer",
            "BeamSearchScorer",
            "LogitsProcessorList",
            "StoppingCriteriaList",
            "HammingDiversityLogitsProcessor",
        ):
            setattr(tf, cls, type(cls, (), {}))
        gu = types.ModuleType("transformers.generation_utils")
        for cls in (
            "BeamSearchOutput",
            "BeamSearchEncoderDecoderOutput",
            "BeamSearchDecoderOnlyOutput",
        ):
            setattr(gu, cls, type(cls, (), {}))
        gu.validate_stopping_criteria = lambda *a, **k: a[0] if a else None
        glp = types.ModuleType("transformers.generation_logits_process")
        glp.TopKLogitsWarper = type("TopKLogitsWarper", (), {})
        _cache["bs"] = _load_module(
            "ref_seal_beam_search",
            f"{REF}/beam_search.py",
            extra_stubs=[
                ("transformers", tf),
                ("transformers.generation_utils", gu),
                ("transformers.generation_logits_process", glp),
            ],
        )
    return _cache["bs"]


# --------------------------------------------------------------------------
# aggregate_evidence fuzz
# --------------------------------------------------------------------------


def _random_case(rng, vocab=40):
    n_docs = int(rng.integers(3, 12))
    docs = [
        rng.integers(4, vocab, size=int(rng.integers(6, 40))).tolist() + [2]
        for _ in range(n_docs)
    ]
    index = FMIndex()
    index.initialize(docs)
    # keys: mix of real spans (positive counts) and random (often count 0)
    keys = []
    for _ in range(int(rng.integers(2, 10))):
        if rng.random() < 0.7:
            d = docs[int(rng.integers(n_docs))]
            i = int(rng.integers(0, max(1, len(d) - 4)))
            keys.append(d[i : i + int(rng.integers(1, 5))])
        else:
            keys.append(rng.integers(4, vocab, size=int(rng.integers(1, 4))).tolist())
    scores = (-rng.random(len(keys)) * 6).tolist()
    ngrams_and_scores = list(zip(keys, scores))
    unigram_scores = None
    if rng.random() < 0.5:
        unigram_scores = (-rng.random(vocab) * 8).tolist()
    knobs = dict(
        alpha=float(rng.choice([1.0, 2.0])),
        beta=float(rng.choice([0.0, 0.8])),
        smoothing=float(rng.choice([1.0, 5.0])),
        max_occurrences_1=int(rng.choice([3, 1500])),
        n_docs_complete_score=int(rng.choice([2, 500])),
        single_key=float(rng.choice([0.0, 0.5])),
        add_best_unigrams_to_ngrams=bool(rng.random() < 0.3),
        use_top_k_unigrams=int(rng.choice([3, 1000])),
        unigrams_ignore_free_places=bool(rng.random() < 0.3),
        sort_by_length=bool(rng.random() < 0.25),
        sort_by_freq=bool(rng.random() < 0.25),
        allow_overlaps=bool(rng.random() < 0.25),
        single_key_add_unigrams=bool(rng.random() < 0.25),
    )
    if knobs["sort_by_length"] and knobs["sort_by_freq"]:
        knobs["sort_by_freq"] = False
    return index, ngrams_and_scores, unigram_scores, knobs


def _normalize(results):
    out = {}
    for doc, info in results.items():
        score, matched, _x, doc_tokens, best = info
        matched_n = sorted((tuple(n), round(float(s), 6)) for n, s in matched)
        out[doc] = (round(float(score), 6), matched_n, list(doc_tokens))
    return out


class _CanonicalOrderView:
    """Duck-typed FMIndex view presenting each ngram's SA range in CANONICAL
    order (doc id asc, within-doc SA order) -- the exact sequence
    ``seal_tpu`` ``FMIndex.occurrences`` feeds the ranker (and that
    ``UnionHostIndex`` reproduces for any shard count).  The reference
    ranker enumerates raw SA rows itself (``keys.py:320-324``:
    ``get_range`` -> ``locate(row)`` -> ``get_doc_index``); this view remaps
    ``get_range`` to a virtual row space whose ``locate`` yields tok_ends in
    canonical order, so the EXECUTED reference visits occurrences in the
    same order our implementation does.  Stage-1 per-doc state is
    order-invariant (positions of distinct docs are disjoint), so this
    only aligns results-dict insertion order, i.e. equal-score
    tie-breaking.
    """

    def __init__(self, index):
        self._index = index
        self._virt = []  # virtual row -> tok_end

    def __getattr__(self, name):
        return getattr(self._index, name)

    def __len__(self):  # dunders bypass __getattr__
        return len(self._index)

    def get_range(self, ngram):
        lo, hi = self._index.get_range(ngram)
        base = len(self._virt)
        tok_ends = np.asarray(self._index.sa[lo:hi], dtype=np.int64)
        doc_ids = (
            np.searchsorted(self._index.doc_boundaries(), tok_ends, side="right")
            - 1
        )
        order = np.argsort(doc_ids, kind="stable")
        self._virt.extend(tok_ends[order].tolist())
        return (base, base + (hi - lo))

    def locate(self, row):
        return int(self._virt[row])


def _assert_same_modulo_ties(raw_res, our_res, tol=1e-6):
    """Rankings identical modulo reordering of docs whose scores are within
    ``tol`` (visit order changes both equal-score insertion order AND the
    float summation order, so 'tied' must be tolerance-based).  A tie group
    can straddle an output cutoff, in which case the SETS differ -- but
    every doc on either exclusive side must score within ``tol`` of the
    boundary (min) score."""
    raw_ids, our_ids = list(raw_res), list(our_res)
    raw_s = {d: float(raw_res[d][0]) for d in raw_ids}
    our_s = {d: float(our_res[d][0]) for d in our_ids}
    raw_only = set(raw_ids) - set(our_ids)
    our_only = set(our_ids) - set(raw_ids)
    if raw_only or our_only:
        boundary = min(min(raw_s.values()), min(our_s.values()))
        for d in raw_only:
            assert abs(raw_s[d] - boundary) <= tol, ("cutoff tie", d)
        for d in our_only:
            assert abs(our_s[d] - boundary) <= tol, ("cutoff tie", d)
    common = set(raw_ids) & set(our_ids)
    for d in common:
        assert raw_s[d] == pytest.approx(our_s[d], abs=tol), d
    raw_seq = [d for d in raw_ids if d in common]
    our_seq = [d for d in our_ids if d in common]
    for a, b in zip(raw_seq, our_seq):
        if a != b:  # order flips only between numerically-tied docs
            assert abs(raw_s[a] - raw_s[b]) <= tol, (a, b)


def _run_case(rk, index, ngrams_and_scores, unigram_scores, knobs):
    ref_res, ref_ngrams = rk.aggregate_evidence(
        [(list(n), s) for n, s in ngrams_and_scores],
        unigram_scores=list(unigram_scores) if unigram_scores else None,
        index=_CanonicalOrderView(index),
        **knobs,
    )
    raw_res, _ = rk.aggregate_evidence(
        [(list(n), s) for n, s in ngrams_and_scores],
        unigram_scores=list(unigram_scores) if unigram_scores else None,
        index=index,
        **knobs,
    )
    our_res, our_ngrams = our_keys.aggregate_evidence(
        [(list(n), s) for n, s in ngrams_and_scores],
        unigram_scores=list(unigram_scores) if unigram_scores else None,
        index=index,
        **knobs,
    )
    return ref_res, ref_ngrams, raw_res, our_res, our_ngrams


@pytest.mark.parametrize("seed", range(40))
def test_aggregate_evidence_matches_reference(seed):
    """Bit-identity vs the executed reference ranker driven through the
    canonical occurrence order (the order both our monolithic and sharded
    indexes produce), PLUS raw-SA-order equivalence modulo exact-score
    tie-breaking (the only divergence the ordering convention can cause)."""
    rk = ref_keys()
    rng = np.random.default_rng(seed)
    index, ngrams_and_scores, unigram_scores, knobs = _random_case(rng)
    ref_res, ref_ngrams, raw_res, our_res, our_ngrams = _run_case(
        rk, index, ngrams_and_scores, unigram_scores, knobs
    )
    assert set(ref_ngrams) == set(our_ngrams)
    for k in ref_ngrams:
        assert math.isclose(ref_ngrams[k], our_ngrams[k], rel_tol=1e-9, abs_tol=1e-9)
    ref_n, our_n = _normalize(ref_res), _normalize(our_res)
    assert list(ref_res) == list(our_res), "doc ranking order differs"
    for doc in ref_n:
        assert ref_n[doc][0] == pytest.approx(our_n[doc][0], abs=1e-6)
        assert ref_n[doc][1] == our_n[doc][1]
        assert ref_n[doc][2] == our_n[doc][2]
    # raw-SA-order reference: identical modulo numerically-tied reordering
    _assert_same_modulo_ties(raw_res, our_res)
    raw_n = _normalize(raw_res)
    for doc in raw_n:
        if doc in our_n:
            assert raw_n[doc][1] == our_n[doc][1]


def test_aggregate_evidence_reference_on_sample_docs():
    """Deterministic case exercising stage-2 trie matching + greedy heap."""
    rk = ref_keys()
    docs = [
        [5, 6, 7, 8, 9, 5, 6, 7, 2],
        [10, 11, 12, 5, 6, 13, 14, 2],
        [10, 11, 12, 10, 11, 12, 7, 8, 2],
    ]
    index = FMIndex()
    index.initialize(docs)
    keys = [([5, 6, 7], -0.4), ([10, 11], -0.8), ([11, 12], -1.1), ([7, 8], -0.9)]
    ref_res, _ = rk.aggregate_evidence([(list(n), s) for n, s in keys], index=index)
    our_res, _ = our_keys.aggregate_evidence([(list(n), s) for n, s in keys], index=index)
    assert _normalize(ref_res) == _normalize(our_res)
    assert list(ref_res) == list(our_res)


# --------------------------------------------------------------------------
# IndexBasedLogitsProcessor differential
# --------------------------------------------------------------------------


def _our_allowed_sets(index, beam_sents, cfg_kwargs, vocab):
    """Allowed-token masks via the repo's fused candidate path (dense mode)."""
    import jax

    from seal_tpu.decoding.constrained import (
        DecodeConfig,
        SingleIndexOps,
        _candidates_general,
    )
    from seal_tpu.index.device_index import DeviceFMIndex
    import jax.numpy as jnp

    dev = DeviceFMIndex.from_host(index, vocab=vocab)
    ops = SingleIndexOps(dev)
    cfg = DecodeConfig(
        num_beams=len(beam_sents[0]),
        exact_mask=True,
        eos_token_id=2,
        pad_token_id=0,
        **cfg_kwargs,
    )
    B, K = len(beam_sents), len(beam_sents[0])
    lo = np.zeros((B, K), np.int32)
    hi = np.zeros((B, K), np.int32)
    prev = np.zeros((B, K), np.int32)
    fin = np.zeros((B, K), bool)
    force = list(cfg.force_decoding_from or ())
    for b in range(B):
        for k in range(K):
            sent = list(beam_sents[b][k])
            if sent[-1] in (cfg.eos_token_id, cfg.pad_token_id):
                fin[b, k] = True
                continue
            l, h = index.get_range(force + sent[1:])
            lo[b, k], hi[b, k] = l, h
            prev[b, k] = index.get_count(force + sent[1:-1])
    lp = jnp.zeros((B * K, vocab), jnp.float32)
    tokens, allowed, _ = _candidates_general(
        ops, cfg, lp, jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(prev),
        jnp.asarray(fin),
    )
    tokens = np.asarray(tokens)
    allowed = np.asarray(allowed)
    sets = [
        [set(tokens[b, k][allowed[b, k]].tolist()) for k in range(K)]
        for b in range(B)
    ]
    return sets


def _ref_allowed_sets(index, beam_sents, proc_kwargs, vocab):
    import torch

    bs = ref_beam_search()
    K = len(beam_sents[0])
    proc = bs.IndexBasedLogitsProcessor(
        index=index, num_beams=K, pad_token_id=0, eos_token_id=2, **proc_kwargs
    )
    flat = [list(s) for row in beam_sents for s in row]
    L = max(len(s) for s in flat)
    assert all(len(s) == L for s in flat), "processor states must share length"
    input_ids = torch.tensor(flat, dtype=torch.long)
    scores = torch.zeros((len(flat), vocab))
    out = proc(input_ids, scores).numpy()
    sets = []
    for b in range(len(beam_sents)):
        sets.append(
            [
                set(np.nonzero(np.isfinite(out[b * K + k]))[0].tolist())
                for k in range(K)
            ]
        )
    return sets


@pytest.mark.parametrize(
    "proc_kwargs",
    [
        {},
        {"stop_at_count": 2},
        {"always_allow_eos": True},
        {"force_decoding_from": [7]},
    ],
)
def test_processor_allowed_sets_match_reference(proc_kwargs):
    vocab = 40
    rng = np.random.default_rng(11)
    docs = [
        rng.integers(4, vocab, size=int(rng.integers(8, 30))).tolist() + [2]
        for _ in range(10)
    ]
    index = FMIndex()
    index.initialize(docs)

    # beam states: real prefixes (continuable), dead ends, finished beams --
    # all sharing one length like a real decoder batch
    def state(kind):
        if kind == "finished":
            return [2, docs[0][0], 2]
        if kind == "pad":
            return [2, docs[1][0], 0]
        d = docs[int(rng.integers(len(docs)))]
        return [2] + d[:2]

    beam_sents = [
        [state("live"), state("finished"), state("live")],
        [state("pad"), state("live"), state("live")],
    ]
    cfg_kwargs = {
        "stop_at_count": proc_kwargs.get("stop_at_count", 0),
        "always_allow_eos": proc_kwargs.get("always_allow_eos", False),
        "force_decoding_from": tuple(proc_kwargs["force_decoding_from"])
        if "force_decoding_from" in proc_kwargs
        else None,
    }
    ref_sets = _ref_allowed_sets(index, beam_sents, proc_kwargs, vocab)
    our_sets = _our_allowed_sets(index, beam_sents, cfg_kwargs, vocab)
    for b in range(len(beam_sents)):
        for k in range(len(beam_sents[b])):
            assert ref_sets[b][k] == our_sets[b][k], (b, k, beam_sents[b][k])


def test_processor_step1_corpus_set_matches_reference():
    """cur_len==1: the reference allows exactly ``occurring_distinct``."""
    import torch

    bs = ref_beam_search()
    vocab = 40
    rng = np.random.default_rng(3)
    docs = [rng.integers(4, 20, size=12).tolist() + [2] for _ in range(5)]
    index = FMIndex()
    index.initialize(docs)
    proc = bs.IndexBasedLogitsProcessor(
        index=index, num_beams=2, pad_token_id=0, eos_token_id=2
    )
    input_ids = torch.tensor([[2], [2]], dtype=torch.long)
    out = proc(input_ids, torch.zeros((2, vocab))).numpy()
    ref_set = set(np.nonzero(np.isfinite(out[0]))[0].tolist())

    from seal_tpu.index.device_index import DeviceFMIndex

    dev = DeviceFMIndex.from_host(index, vocab=vocab)
    ours = set(np.nonzero(np.asarray(dev.corpus_counts) > 0)[0].tolist())
    assert ref_set == ours
