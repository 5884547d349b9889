"""Key scoring and evidence aggregation (the ranker).

Re-implements the semantics of the reference ``seal/keys.py``:

* ``rescore_keys``          (``keys.py:64-141``): teacher-forced log-prob of
  each key under a (possibly different) conditioning -- a batched, jitted
  ``decode_full`` here instead of per-100 torch minibatches.
* ``compute_unigram_scores`` (``keys.py:144-176``): one decoder step's
  full-vocab log-softmax per query.
* ``aggregate_evidence``     (``keys.py:178-497``): the two-stage
  coverage-aware document ranker.  Stage 1 samples FM-index rows of rare
  ngrams (vectorized ``locate`` = one SA gather on device/host arrays);
  stage 2 re-matches all ngrams in the top documents via a token trie and
  greedily assigns non-overlapping spans with the repetition penalty.
  The log-odds key score is
  ``max(0, (sr + log(1-e^snr)) - (snr + log(1-e^sr)))^alpha`` with
  ``snr = log((count+smoothing)/(ntokens+smoothing))`` -- LM evidence vs
  corpus frequency (``keys.py:216-227``).

Scoring pipeline helpers (``strip``, ``deduplicate``,
``decompose_query_into_keys``) keep reference behavior exactly.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from functools import lru_cache
from heapq import heappop, heappush
from itertools import chain, product
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from seal_tpu.models import api as model_api
from seal_tpu.models.config import BartConfig
from seal_tpu.models.tokenizer import word_tokenize


# --------------------------------------------------------------------- utils


def deduplicate(list_of_lists):
    """Order-preserving dedup of keys / (score, key) pairs
    (parity: reference ``keys.py:19-35``)."""
    present = set()
    result = []
    for el in list_of_lists:
        x = el
        if el and isinstance(el[0], float):
            el = el[1]
        t_el = tuple(int(t) for t in el)
        if t_el in present:
            continue
        present.add(t_el)
        result.append(x)
    return result


def strip(seq, symbols_start, symbols_end):
    """Trim marker symbols from both ends (parity: ``keys.py:54-61``)."""
    i = 0
    while i < len(seq) and seq[i] in symbols_start:
        i += 1
    j = len(seq)
    while j > i and seq[j - 1] in symbols_end:
        j -= 1
    return seq[i:j]


def decompose_query_into_keys(query: str, length: int = 3) -> List[str]:
    """All <=length-word spans of the query in every capitalization variant,
    with a leading space (parity: ``keys.py:38-51``; the spaCy tokenizer is
    replaced by a regex word tokenizer)."""
    strings = set()
    tokens = word_tokenize(query.strip())
    for i in range(len(tokens)):
        for j in range(i + 1, min(1 + len(tokens), i + length + 1)):
            span = tokens[i:j]
            for upper in product(*([[True, False]] * (j - i))):
                ss = [s[0].upper() + s[1:] if u else s for u, s in zip(upper, span)]
                strings.add(" " + " ".join(ss))
    return list(strings)


# ---------------------------------------------------------------- LM scoring


def _pad_to(seqs: Sequence[Sequence[int]], pad: int, multiple: int = 8):
    """Right-pad to a length bucket (multiple-of-8 lengths keep the set of
    compiled shapes small -- recompiles dominate steady-state cost otherwise)."""
    maxlen = max(len(s) for s in seqs)
    maxlen = ((maxlen + multiple - 1) // multiple) * multiple
    ids = np.full((len(seqs), maxlen), pad, np.int32)
    for i, s in enumerate(seqs):
        ids[i, : len(s)] = s
    return ids


@lru_cache(maxsize=32)
def _jitted_rescore(model_cfg: BartConfig):
    bart = model_api.module_for(model_cfg)

    def run(params, enc_out, enc_mask, dec_ids):
        logits = bart.decode_full(model_cfg, params, enc_out, enc_mask, dec_ids[:, :-1])
        lp = jax.nn.log_softmax(logits, axis=-1)
        tgt = dec_ids[:, 1:]
        tok_lp = jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
        tok_lp = jnp.where(tgt < 2, 0.0, tok_lp)  # zero bos/pad (keys.py:132)
        return tok_lp

    return jax.jit(run)


@lru_cache(maxsize=32)
def _jitted_encode(model_cfg: BartConfig):
    bart = model_api.module_for(model_cfg)
    return jax.jit(lambda params, ids, mask: bart.encode(model_cfg, params, ids, mask))


def rescore_keys(
    model_cfg: BartConfig,
    params,
    inputs: Optional[Sequence[Sequence[int]]],
    list_of_decoded: Sequence[Sequence],
    batch_size: int = 256,
    length_penalty: float = 0.0,
    prefix: Sequence[int] = (),
    strip_from_bos: Sequence[int] = (),
    strip_from_eos: Sequence[int] = (),
) -> List[List[Tuple[float, List[int]]]]:
    """Per-query [(score, key), ...] with teacher-forced LM scores.

    Accepts keys as token lists or (score, key) pairs (rescored), exactly
    like the reference.
    """
    start = model_cfg.decoder_start_token_id
    pad = model_cfg.pad_token_id
    if inputs is None:
        inputs = [[model_cfg.bos_token_id, model_cfg.eos_token_id]] * len(list_of_decoded)
    inputs = [list(i) for i in inputs]
    list_of_decoded = [
        [list(x[1]) if (x and isinstance(x[0], float)) else list(x) for x in xx]
        for xx in list_of_decoded
    ]

    enc_ids = _pad_to(inputs, pad)
    enc_mask = (enc_ids != pad).astype(np.int32)
    enc_out = _jitted_encode(model_cfg)(params, jnp.asarray(enc_ids), jnp.asarray(enc_mask))
    enc_out = jnp.asarray(enc_out)

    jobs = []  # (query_idx, original_key, decoder_ids)
    for qi, keys in enumerate(list_of_decoded):
        for di in keys:
            stripped = strip(di, strip_from_bos, strip_from_eos)
            dec = [start] + list(prefix) + list(stripped)
            jobs.append((qi, di, dec))

    all_out: Dict[int, List[Tuple[float, List[int]]]] = {
        i: [] for i in range(len(list_of_decoded))
    }
    if not jobs:
        return [all_out[i] for i in range(len(list_of_decoded))]
    run = _jitted_rescore(model_cfg)
    for off in range(0, len(jobs), batch_size):
        batch = jobs[off : off + batch_size]
        n_real = len(batch)
        if n_real < batch_size:
            # pad the ragged tail to the full batch shape (avoid recompiles)
            batch = batch + [batch[0]] * (batch_size - n_real)
        dec_ids = _pad_to([d for _, _, d in batch], pad)
        qidx = np.array([q for q, _, _ in batch])
        tok_lp = np.asarray(
            run(
                params,
                enc_out[qidx],
                jnp.asarray(enc_mask[qidx]),
                jnp.asarray(dec_ids),
            )
        )
        tok_lp = tok_lp[:, len(prefix):]  # drop forced-prefix positions
        lls = tok_lp.sum(-1)
        for (qi, di, _), ll in zip(batch[:n_real], lls[:n_real]):
            sco = float(ll) / (len(di) ** length_penalty) if di else float(ll)
            all_out[qi].append((sco, di))
    return [all_out[i] for i in range(len(list_of_decoded))]


@lru_cache(maxsize=32)
def _jitted_unigram(model_cfg: BartConfig, n_prefix: int):
    bart = model_api.module_for(model_cfg)

    def run(params, ids, mask, dec_ids):
        enc = bart.encode(model_cfg, params, ids, mask)
        logits = bart.decode_full(model_cfg, params, enc, mask, dec_ids)
        return jax.nn.log_softmax(logits[:, n_prefix], axis=-1)

    return jax.jit(run)


def compute_unigram_scores(
    model_cfg: BartConfig,
    params,
    inputs: Sequence[Sequence[int]],
    temperature: float = 1.0,
    prefix: Sequence[int] = (),
    tolist: bool = True,
):
    """First-step (optionally after ``prefix``) full-vocab log-probs per
    query (parity: ``keys.py:144-176``)."""
    pad = model_cfg.pad_token_id
    ids = _pad_to([list(i) for i in inputs], pad)
    mask = (ids != pad).astype(np.int32)
    dec = np.full((len(inputs), 1 + len(prefix)), model_cfg.decoder_start_token_id, np.int32)
    for i, t in enumerate(prefix, start=1):
        dec[:, i] = t
    lp = _jitted_unigram(model_cfg, len(prefix))(
        params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(dec)
    )
    lp = np.asarray(lp, dtype=np.float64)
    if temperature != 1.0:
        lp = lp / temperature  # parity note: reference divides logits pre-softmax
    if tolist:
        return lp.tolist()
    return lp


# ------------------------------------------------------------------- ranking


def _log_odds_score(sr: float, count: int, ntokens: float, smoothing: float,
                    alpha: float, length_penalty: float, ngram_len: int) -> float:
    """The LM-vs-corpus log-odds key score (``keys.py:216-227``)."""
    sr = sr - 1e-10
    sr *= (1.0 - length_penalty) ** (ngram_len - 1.0)
    snr = math.log((count + smoothing) / (ntokens + smoothing))
    sco = (sr + math.log1p(-math.exp(snr))) - (snr + math.log1p(-math.exp(sr)))
    sco = max(sco, 0.0)
    return sco ** alpha


def aggregate_evidence(
    ngrams_and_scores: List[Tuple[List[int], float]],
    unigram_scores: Optional[List[float]] = None,
    index=None,  # host FMIndex (or anything with its query API)
    max_occurrences_1: int = 1500,
    max_occurrences_2: int = 10_000_000,
    n_docs_complete_score: int = 500,
    alpha: float = 2.0,
    beta: float = 0.8,
    length_penalty: float = 0.0,
    use_fm_index_frequency: bool = True,
    add_best_unigrams_to_ngrams: bool = False,
    use_top_k_unigrams: int = 1000,
    sort_by_length: bool = False,
    sort_by_freq: bool = False,
    smoothing: float = 5.0,
    allow_overlaps: bool = False,
    single_key: float = 0.0,
    single_key_add_unigrams: bool = False,
    unigrams_ignore_free_places: bool = False,
    range_fn=None,  # optional batched List[ngram] -> [(lo, hi), ...] (device)
):
    """Aggregate key scores into ranked documents.

    Returns (results, all_ngrams): ``results[doc] = [score, matched_ngrams,
    None, doc_tokens, best_single_ngram]`` sorted by descending score --
    identical layout to the reference so downstream consumers are drop-in.
    """

    def repetition(ngram_set, score, coverage):
        if not coverage:
            return score
        coeff = 1.0 - beta + (beta * len(ngram_set.difference(coverage)) / len(ngram_set))
        return coeff * score

    ntokens = float(index.beginnings[-1])
    ngrams_and_scores = [
        (list(ngram), float(sr)) for ngram, sr in ngrams_and_scores
    ]
    counts: Dict[tuple, int] = {(): len(index)}

    if not use_fm_index_frequency:
        cutoff = sorted(ngrams_and_scores, key=lambda x: x[1])[0][1] - 0.1
    else:
        cutoff = None

    # ranges (and thus counts) for every input ngram in one batched call
    # when a device range_fn is provided (the TPU host is often 1-core; the
    # per-ngram searchsorted chain dominates otherwise)
    ranges_pre: Dict[tuple, Tuple[int, int]] = {}
    if range_fn is not None and ngrams_and_scores:
        uniq = list({tuple(n) for n, _ in ngrams_and_scores})
        for n, r in zip(uniq, range_fn([list(n) for n in uniq])):
            ranges_pre[n] = (int(r[0]), int(r[1]))

    def get_range_cached(ngram_t: tuple) -> Tuple[int, int]:
        r = ranges_pre.get(ngram_t)
        if r is None:
            r = index.get_range(list(ngram_t))
            ranges_pre[ngram_t] = r
        return r

    # ---- key scores ------------------------------------------------------
    unigrams = {0, 1, 2}
    scored: List[Tuple[List[int], float]] = []
    for ngram, sr in ngrams_and_scores:
        if len(ngram) == 1:
            unigrams.add(ngram[0])
        lo_, hi_ = get_range_cached(tuple(ngram))
        count = hi_ - lo_
        counts[tuple(ngram)] = count
        if count == 0:
            sco = 0.0
        elif use_fm_index_frequency:
            sco = _log_odds_score(sr, count, ntokens, smoothing, alpha, length_penalty, len(ngram))
        else:
            sco = max(sr - cutoff, 0.0)
            sco *= (1.0 - length_penalty) ** (len(ngram) - 1.0)
            sco **= alpha
        scored.append((ngram, sco))
    ngrams_and_scores = scored

    # ---- unigram scores --------------------------------------------------
    if unigram_scores is not None:
        unigram_scores = list(unigram_scores)
        best = sorted(range(len(unigram_scores)), reverse=True, key=lambda i: unigram_scores[i])
        best = set(best[:use_top_k_unigrams])
        unigram_scores = [s if i in best else float("-inf") for i, s in enumerate(unigram_scores)]
        # O(1) single-token counts via the C array when available (the
        # reference walks the index for every vocab entry, keys.py:252)
        count1 = getattr(index, "token_count", lambda i: index.get_count([i]))
        for i in range(len(unigram_scores)):
            if i in unigrams:
                unigram_scores[i] = 0.0
                continue
            sr = unigram_scores[i]
            if sr == float("-inf"):
                # not in the top-k: score is 0 regardless of count
                unigram_scores[i] = 0.0
                continue
            count = count1(i)
            if count == 0:
                sco = 0.0
            elif use_fm_index_frequency:
                # note: the reference applies no alpha exponent here (keys.py:255-261)
                sr_ = sr
                snr = math.log((count + smoothing) / (ntokens + smoothing))
                try:
                    sco = (sr_ + math.log1p(-math.exp(snr))) - (snr + math.log1p(-math.exp(sr_)))
                except ValueError:  # sr == 0.0 -> log(0)
                    sco = 0.0
                sco = max(sco, 0.0)
            else:
                sco = max(sr - cutoff, 0.0) ** alpha
            unigram_scores[i] = sco if sco != 0.0 else 0.0

        if add_best_unigrams_to_ngrams:
            best_unigrams = sorted(
                range(len(unigram_scores)), key=lambda x: -unigram_scores[x]
            )[: len(ngrams_and_scores)]
            for i in best_unigrams:
                counts[(i,)] = count1(i)
                ngrams_and_scores.append(([i], unigram_scores[i]))

    # ---- rare / frequent split (keys.py:280-309) -------------------------
    rare_ngrams: Dict[tuple, float] = defaultdict(float)
    freq_ngrams: Dict[tuple, float] = defaultdict(float)
    for ngram, sco in ngrams_and_scores:
        count = counts.get(tuple(ngram))
        if count is None:
            count = index.get_count(ngram)
            counts[tuple(ngram)] = count
        if count > max_occurrences_2 or sco == 0.0:
            continue
        target = freq_ngrams if (count > max_occurrences_1 or sco < 0.0) else rare_ngrams
        target[tuple(ngram)] = sco

    rare_ngrams = dict(sorted(rare_ngrams.items(), key=lambda x: x[1], reverse=True))
    freq_ngrams = dict(sorted(freq_ngrams.items(), key=lambda x: x[1], reverse=True))
    all_ngrams = dict(
        sorted(chain(rare_ngrams.items(), freq_ngrams.items()), key=lambda x: x[1], reverse=True)
    )

    # ---- stage 1: rare-ngram occurrence sampling (keys.py:311-364) -------
    first_stage: Dict[int, list] = defaultdict(lambda: [0.0, [], [[], 0.0]])

    n_corpus = int(index.beginnings[-1]) + getattr(index, "n_sentinels", 1)
    covered = np.zeros(n_corpus + 2, dtype=np.uint8)  # vectorized covered_points
    try:
        from seal_tpu.cpp import native as _native

        claim = _native.load().stage1_claim
    except Exception:  # pragma: no cover - fallback when g++ unavailable
        def claim(cov, ends, length):
            flags = np.empty(ends.size, bool)
            for i, e in enumerate(ends):
                s = max(int(e) - length, 0)
                fresh = not cov[s:e].any()
                flags[i] = fresh
                if fresh:
                    cov[s:e] = 1
            return flags

    for ngram, sco in rare_ngrams.items():
        # vectorized locate (SA slice) + doc lookup for the whole interval
        # (the reference walks a sampled SA per row, keys.py:320-326); spans
        # with tok_start < 0 (reference pseudo-spans at the corpus edge,
        # keys.py:322-325) are clamped to 0
        tok_ends, doc_ids = index.occurrences(
            list(ngram), max_occurrences_1, rng=ranges_pre.get(tuple(ngram))
        )
        n_rows = len(tok_ends)
        new_flags = claim(covered, tok_ends, len(ngram))

        if sort_by_length:
            order = (len(ngram), sco)
        elif sort_by_freq:
            order = (-counts[tuple(ngram)], sco)
        else:
            order = sco

        doc_done: set = set()
        for row_i in range(n_rows):
            doc = int(doc_ids[row_i])
            info = first_stage[doc]
            if sort_by_length:
                max_order = (len(info[2][0]), info[2][1])
            elif sort_by_freq:
                max_order = (-counts.get(tuple(info[2][0]), 0), info[2][1])
            else:
                max_order = info[2][1]
            if order > max_order:
                info[2] = [ngram, sco]
            if (new_flags[row_i] or allow_overlaps) and doc not in doc_done:
                doc_done.add(doc)
                info[0] += sco
                info[1].append((ngram, sco))

    # per-doc coverage re-scoring (keys.py:352-364)
    for doc, doc_info in first_stage.items():
        current_coverage = set()
        current_score = 0.0
        for i in range(len(doc_info[1])):
            tt, sco = doc_info[1][i]
            tts = set(tt)
            new_sco = repetition(tts, sco, current_coverage)
            current_score += new_sco
            doc_info[1][i] = [tt, new_sco]
            current_coverage |= tts
        doc_info[0] = current_score

    to_fully_score = sorted(
        first_stage.items(),
        key=lambda x: (1.0 - single_key) * (-x[1][0]) + single_key * (-x[1][2][1]),
    )[:n_docs_complete_score]

    # ---- stage 2: full multi-pattern matching (keys.py:377-497) ----------
    results: Dict[int, list] = defaultdict(
        lambda: [0.0, [], None, None, [[], 0.0]]
    )

    # the match set of the reference's streaming token trie, computed by one
    # Aho-Corasick pass over all candidate docs (native) or the trie fallback
    patterns = [n for n, s in all_ngrams.items() if len(n) >= 1 and s > 0.0]
    pat_scores = [all_ngrams[n] for n in patterns]
    doc_list = [doc for doc, _ in to_fully_score]
    doc_tokens_list = [[2] + index.get_doc(doc)[:-1] for doc in doc_list]

    per_doc_matches: List[Dict[tuple, list]] = []
    try:
        from seal_tpu.cpp import native as _native

        triples = _native.load().ac_match(
            [list(p) for p in patterns], doc_tokens_list
        )
        # group by doc; insertion order = (end position, shorter first) to
        # mirror the reference's streaming completion order
        per_doc_matches = [dict() for _ in doc_list]
        if len(triples):
            plen = np.array([len(p) for p in patterns], np.int64)
            ends = triples[:, 2] + plen[triples[:, 1]]
            order = np.lexsort((plen[triples[:, 1]], ends, triples[:, 0]))
            for t in order:
                d, p, start = int(triples[t, 0]), int(triples[t, 1]), int(triples[t, 2])
                per_doc_matches[d].setdefault(patterns[p], [pat_scores[p], []])[1].append(
                    (start, start + int(plen[p]))
                )
    except Exception:  # pragma: no cover - g++ unavailable
        trie: Dict = {}
        for ngram, score in zip(patterns, pat_scores):
            node = trie
            for t in ngram:
                node = node.setdefault(t, {})
            node[-1] = score
        for doc_tokens in doc_tokens_list:
            matches: Dict[tuple, list] = {}
            open_matches: List[tuple] = []
            for i, tok in enumerate(doc_tokens):
                open_matches = [
                    (m.get(tok), l + 1, n) for (m, l, n) in open_matches
                ] + [(trie.get(tok), 1, [])]
                for _, _, n in open_matches:
                    n.append(tok)
                new_open = []
                while open_matches:
                    m, l, n = open_matches.pop()
                    if m is None:
                        continue
                    new_open.append((m, l, n))
                    if -1 in m:
                        matches.setdefault(tuple(n), [m[-1], []])[1].append(
                            (i - l + 1, i + 1)
                        )
                open_matches = new_open
            per_doc_matches.append(matches)

    for doc, doc_tokens, matches in zip(doc_list, doc_tokens_list, per_doc_matches):
        results[doc][3] = doc_tokens

        if unigram_scores is not None:
            type_scores = {t: unigram_scores[t] if t < len(unigram_scores) else 0.0
                           for t in doc_tokens}
        else:
            type_scores = {t: 0.0 for t in doc_tokens}

        greedy_matches: List[tuple] = []
        for n, (s, d) in matches.items():
            if sort_by_length:
                order = (-len(n), -s)
                max_order = (-len(results[doc][4][0]), -results[doc][4][1])
            elif sort_by_freq:
                order = (counts.get(tuple(n), 0), -s)
                max_order = (counts.get(tuple(results[doc][4][0]), 0), -results[doc][4][1])
            else:
                order = -s
                max_order = -results[doc][4][1]
            for (i, j) in d:
                heappush(greedy_matches, (-s, n, s, i, j))
            if order < max_order:
                results[doc][4] = [n, s]

        current_coverage = set()
        ngrams_found: List[tuple] = []
        prev = None
        free = [True] * len(doc_tokens)

        while greedy_matches:
            _, n, s, i, j = heappop(greedy_matches)
            n_set = set(n)
            if prev == n:
                new_s = ngrams_found[-1][1]
            elif not n_set:
                new_s = 0.0
            else:
                new_s = repetition(n_set, s, current_coverage)
            if new_s <= 0.0:
                continue
            if not (allow_overlaps or all(free[i:j])):
                continue
            if prev == n:
                ngrams_found[-1] = (n, new_s)
            else:
                prev = n
                current_coverage |= n_set
                ngrams_found.append((n, new_s))
            free[i:j] = [False] * (j - i)

        if unigrams_ignore_free_places:
            free = [True] * len(free)

        single_key_score = results[doc][4][1]
        multi_key_score = sum(s for _, s in ngrams_found)
        unigram_score = 0.0
        for t, _f in Counter(t for t, b in zip(doc_tokens, free) if b).items():
            s = type_scores[t]
            if s > 0.0:
                n = (t,)
                s = repetition(set(n), s, current_coverage)
                if s != 0.0:
                    unigram_score += s
                    ngrams_found.append((n, s))

        if single_key_add_unigrams:
            single_key_score += unigram_score
        multi_key_score += unigram_score

        results[doc][0] = (1.0 - single_key) * multi_key_score + single_key * single_key_score
        results[doc][1] = ngrams_found

    results = dict(sorted(results.items(), key=lambda x: -x[1][0]))
    return results, all_ngrams
