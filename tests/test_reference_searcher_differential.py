"""Full-pipeline differential: our SEALSearcher vs the EXECUTED reference.

Round-2 parity covered the processor, the beam-search loop, and the ranker
each in isolation.  This file composes them: it executes the genuine
reference ``SEALSearcher`` (``/root/reference/seal/retrieval.py`` --
``batch_generate_keys``'s body/title/code decodes, marker handling,
strip/filter chains, rescore, query decomposition, unigrams,
``retrieve_from_keys``, ``batch_search``) with the torch model calls backed
by THIS repo's JAX BART through a transformers-4.13 API shim, and asserts
our ``SEALSearcher.batch_search`` produces identical ranked documents.

Both sides share the same host FMIndex, the same word-vocab tokenizer
(wrapped in an HF-surface shim for the reference), and the same JAX model
function -- so any divergence isolates the ~400 lines of searcher plumbing
(the glue the component tests cannot see).

Documented deviations:
* spaCy is not installed; the reference's word tokenizer is stubbed with
  our regex ``word_tokenize``, so decomposition parity covers the
  span/capitalization logic, not spaCy-vs-regex tokenization.
* Scores are compared rounded/approx: our decode uses a KV cache, the shim
  re-decodes fully each step (same math, different accumulation order).
"""

import contextlib
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seal_tpu.index import FMIndex
from seal_tpu.models import bart
from seal_tpu.models.config import bart_tiny
from seal_tpu.models.tokenizer import WordVocabTokenizer, word_tokenize
from seal_tpu.retrieval.searcher import SEALSearcher

REF = "/root/reference/seal"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not mounted"
)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_reference_differential import _load_module, ref_beam_search, ref_keys  # noqa: E402


# --------------------------------------------------------------------------
# reference module loading (genuine retrieval.py atop genuine beam_search/keys)
# --------------------------------------------------------------------------

_cache = {}


def ref_retrieval():
    if "retrieval" in _cache:
        return _cache["retrieval"]
    bs_mod = ref_beam_search()
    keys_mod = ref_keys()
    utils_stub = types.ModuleType("seal.utils")
    utils_stub.load_state_dict_from_fairseq_checkpoint = lambda *a, **k: None
    utils_stub.load_state_dict_from_lightning_checkpoint = lambda *a, **k: None

    # spaCy is absent: back the reference's word tokenizer with ours
    class _Tok:
        def __init__(self, text):
            self.text = text

    class English:
        def __init__(self):
            self.tokenizer = lambda text: [_Tok(t) for t in word_tokenize(text)]

    import importlib.machinery

    spacy_mod = types.ModuleType("spacy")
    lang_mod = types.ModuleType("spacy.lang")
    en_mod = types.ModuleType("spacy.lang.en")
    en_mod.English = English
    spacy_mod.lang = lang_mod
    lang_mod.en = en_mod
    for m in (spacy_mod, lang_mod, en_mod):
        # transformers probes importlib.util.find_spec("spacy"); a spec-less
        # stub in sys.modules makes that raise ValueError
        m.__spec__ = importlib.machinery.ModuleSpec(m.__name__, None)
        # the reference imports spaCy lazily at call time
        # (_init_word_tokenizer, retrieval.py:39-43), so the stub must stay
        # installed -- no real spaCy exists in this environment
        sys.modules[m.__name__] = m

    mod = _load_module(
        "ref_seal_retrieval",
        f"{REF}/retrieval.py",
        extra_stubs=[
            ("seal.beam_search", bs_mod),
            ("seal.keys", keys_mod),
            ("seal.utils", utils_stub),
            ("spacy", spacy_mod),
            ("spacy.lang", lang_mod),
            ("spacy.lang.en", en_mod),
        ],
    )
    _cache["retrieval"] = mod
    return mod


# --------------------------------------------------------------------------
# transformers-4.13 shims backed by the repo's JAX BART / word tokenizer
# --------------------------------------------------------------------------


class HfTokenizerShim:
    """The slice of the HF tokenizer surface retrieval.py touches, backed by
    the shared WordVocabTokenizer so both searchers tokenize identically."""

    def __init__(self, tok: WordVocabTokenizer, max_len: int):
        self.tok = tok
        self.max_len = max_len

    def __call__(self, texts, padding=False, truncation=False,
                 return_tensors=None, add_special_tokens=True):
        import torch

        seqs = [self.tok.encode(t, add_special_tokens=add_special_tokens) for t in texts]
        if truncation:
            seqs = [s[: self.max_len] for s in seqs]
        if return_tensors == "pt":
            L = max(len(s) for s in seqs)
            pad = self.tok.pad_token_id
            ids = torch.full((len(seqs), L), pad, dtype=torch.long)
            mask = torch.zeros((len(seqs), L), dtype=torch.long)
            for i, s in enumerate(seqs):
                ids[i, : len(s)] = torch.tensor(s)
                mask[i, : len(s)] = 1
            return {"input_ids": ids, "attention_mask": mask}
        return {"input_ids": seqs}

    @contextlib.contextmanager
    def as_target_tokenizer(self):
        yield self

    def decode(self, ids, skip_special_tokens=False, clean_up_tokenization_spaces=True):
        return self.tok.decode(list(ids), skip_special_tokens=skip_special_tokens)

    def batch_decode(self, seqs, skip_special_tokens=False, clean_up_tokenization_spaces=True):
        return [self.decode(s, skip_special_tokens) for s in seqs]


class _MinLength:
    """HF 4.13 MinLengthLogitsProcessor (bans eos while cur_len < min_length)."""

    def __init__(self, min_length, eos_token_id):
        self.min_length = min_length
        self.eos_token_id = eos_token_id

    def __call__(self, input_ids, scores):
        if input_ids.shape[-1] < self.min_length:
            scores[:, self.eos_token_id] = float("-inf")
        return scores


class _ProcessorList(list):
    def __call__(self, input_ids, scores):
        for p in self:
            scores = p(input_ids, scores)
        return scores


class _StopAtLen:
    def __init__(self, max_length):
        self.max_length = max_length

    def __len__(self):
        return 1

    def __call__(self, input_ids, scores):
        return input_ids.shape[-1] >= self.max_length


class Hf413ModelShim:
    """The transformers-4.13 model surface the reference pipeline touches
    (generation internals + teacher-forced forwards), forwarding the actual
    math to the repo's JAX BART -- both searchers therefore run the same
    model function.  No KV cache (tiny shapes; ``past`` stays None)."""

    def __init__(self, cfg, params):
        self.cfg = cfg
        self.params = params
        self.config = types.SimpleNamespace(
            pad_token_id=cfg.pad_token_id,
            eos_token_id=cfg.eos_token_id,
            bos_token_id=cfg.bos_token_id,
            decoder_start_token_id=cfg.decoder_start_token_id,
            forced_bos_token_id=None,
            is_encoder_decoder=True,
            output_scores=False,
            output_attentions=False,
            output_hidden_states=False,
            return_dict_in_generate=False,
        )

    # --- misc surface -----------------------------------------------------
    def parameters(self):
        import torch

        yield torch.zeros(1)

    def adjust_logits_during_generation(self, logits, cur_len):
        return logits

    # --- generation internals (4.13 semantics) ----------------------------
    def _get_logits_processor(self, *, min_length=None, eos_token_id=None,
                              forced_bos_token_id=None, **kwargs):
        # 4.13 falls back to config for None args before deciding inclusion
        eos = eos_token_id if eos_token_id is not None else self.config.eos_token_id
        procs = _ProcessorList()
        if min_length is not None and eos is not None and min_length > -1:
            procs.append(_MinLength(min_length, eos))
        assert forced_bos_token_id is None  # load_bart nulls it (retrieval.py:566)
        return procs

    def _get_stopping_criteria(self, max_length=None, max_time=None, **kwargs):
        return _StopAtLen(max_length)

    def _prepare_encoder_decoder_kwargs_for_generation(self, input_ids, model_kwargs):
        import torch

        ids = jnp.asarray(input_ids.cpu().numpy())
        mask = jnp.asarray(model_kwargs["attention_mask"].cpu().numpy().astype(np.int32))
        enc = bart.encode(self.cfg, self.params, ids, mask)
        model_kwargs = dict(model_kwargs)
        model_kwargs["encoder_outputs"] = types.SimpleNamespace(
            last_hidden_state=torch.from_numpy(np.asarray(enc, np.float32)),
            get=lambda *a, **k: None,
        )
        return model_kwargs

    def _prepare_decoder_input_ids_for_generation(self, batch_size, decoder_start_token_id, bos_token_id):
        import torch

        return torch.full((batch_size, 1), decoder_start_token_id, dtype=torch.long)

    def _expand_inputs_for_generation(self, input_ids, expand_size=1,
                                      is_encoder_decoder=True, **model_kwargs):
        import torch

        idx = torch.arange(input_ids.shape[0]).repeat_interleave(expand_size)
        input_ids = input_ids[idx]
        model_kwargs["attention_mask"] = model_kwargs["attention_mask"][idx]
        eo = model_kwargs["encoder_outputs"]
        eo.last_hidden_state = eo.last_hidden_state[idx]
        return input_ids, model_kwargs

    def prepare_inputs_for_generation(self, decoder_input_ids, past=None,
                                      attention_mask=None, encoder_outputs=None,
                                      use_cache=None, **kwargs):
        return {
            "decoder_input_ids": decoder_input_ids,
            "attention_mask": attention_mask,
            "encoder_outputs": encoder_outputs,
        }

    def _update_model_kwargs_for_generation(self, outputs, model_kwargs, is_encoder_decoder=True):
        model_kwargs["past"] = None
        return model_kwargs

    # --- forward ----------------------------------------------------------
    def __call__(self, input_ids=None, attention_mask=None, encoder_outputs=None,
                 decoder_input_ids=None, return_dict=True, **kwargs):
        import torch

        mask = jnp.asarray(attention_mask.cpu().numpy().astype(np.int32))
        if encoder_outputs is None:
            enc = bart.encode(
                self.cfg, self.params, jnp.asarray(input_ids.cpu().numpy()), mask
            )
        elif isinstance(encoder_outputs, tuple):  # rescore_keys (keys.py:125)
            enc = jnp.asarray(encoder_outputs[0].cpu().numpy())
        else:
            enc = jnp.asarray(encoder_outputs.last_hidden_state.cpu().numpy())
        dec = jnp.asarray(decoder_input_ids.cpu().numpy())
        logits = bart.decode_full(self.cfg, self.params, enc, mask, dec)
        return types.SimpleNamespace(
            logits=torch.from_numpy(np.asarray(logits, np.float32))
        )


# --------------------------------------------------------------------------
# shared fixture: corpus, tokenizer, model, host index
# --------------------------------------------------------------------------

CORPUS = [
    ("d0", "Soup", "c00", "you can eat soup with a spoon but eating soup with a fork is hard"),
    ("d1", "Forks", "c01", "a fork is a utensil with tines used for spearing solid food"),
    ("d2", "Bicycles", "c02", "a bicycle has two wheels and is propelled by pedals"),
    ("d3", "Rivers", "c03", "a river is a natural stream of fresh water flowing toward an ocean"),
    ("d4", "Chess", "c04", "chess is a board game for two players with sixteen pieces each"),
    ("d5", "Bread", "c05", "bread is baked from flour and water often with yeast added"),
]


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(0)
    filler_words = [f"word{i}" for i in range(60)]
    corpus = list(CORPUS) + [
        (f"f{i}", f"Filler{i}", f"c1{i}", " ".join(rng.choice(filler_words, size=25)))
        for i in range(16)
    ]
    # doc layout: title @@ code || body  (title/code/body decodes all grounded)
    texts = [f"{title} @@ {code} || {body}" for _, title, code, body in corpus]
    tok = WordVocabTokenizer.train([" " + t for t in texts], max_vocab=1000)
    docs = [tok.encode_plain(" " + t) + [tok.eos_token_id] for t in texts]
    host = FMIndex()
    host.initialize(docs, labels=[d for d, _, _, _ in corpus])
    cfg = bart_tiny(vocab_size=tok.vocab_size)
    params = bart.init_params(jax.random.PRNGKey(0), cfg)
    # boost real-doc tokens so keys carry LM signal over the frequency prior
    bias = np.zeros(cfg.vocab_size, np.float32)
    for _, title, code, body in CORPUS:
        for t in tok.encode_plain(" " + title + " " + code + " " + body):
            bias[t] = 8.0
    params = dict(params)
    params["final_logits_bias"] = jnp.asarray(bias)
    return tok, cfg, params, host


QUERIES = ["eating soup with a fork", "fresh water river ocean"]


def boost_words(world, texts, amount=16.0):
    """A copy of ``world`` whose LM favors the given (leading-space) texts.

    Step 1 of a title/code decode allows ALL corpus symbols even under
    ``force_decoding_from`` (reference ``beam_search.py:73-77``), so those
    key families only appear when their first tokens win step-1 beam slots.
    """
    tok, cfg, params, host = world
    bias = np.array(params["final_logits_bias"])
    for t in texts:
        bias[tok.encode_plain(t)] = amount
    params2 = dict(params)
    params2["final_logits_bias"] = jnp.asarray(bias)
    return (tok, cfg, params2, host)


def make_searchers(world, **knobs):
    tok, cfg, params, host = world
    common = dict(
        beam=3,
        length=3,
        batch_size=2,
        add_query_to_keys=False,
        decode_titles=False,
        unigram_scores=False,
        use_top_k_ngrams=50,
        progress=False,
    )
    common.update(knobs)

    ours = SEALSearcher(
        host, tok, cfg, params, backbone="word-vocab", pipeline=False, **common
    )

    rmod = ref_retrieval()
    tok_shim = HfTokenizerShim(tok, cfg.max_position_embeddings)
    model_shim = Hf413ModelShim(cfg, params)
    ref = rmod.SEALSearcher(host, tok_shim, model_shim,
                            backbone="facebook/bart-large", **common)
    # align the marker token ids with the word-vocab tokenizer (the reference
    # hardcodes BART BPE ids 49314/'@@' and 45056/'||', retrieval.py:482-492)
    ref.title_bos_token_id = ours.title_bos_token_id
    ref.title_eos_token_id = ours.title_eos_token_id
    ref.code_bos_token_id = ours.code_bos_token_id
    ref.code_eos_token_id = ours.code_eos_token_id
    ref.strip_token_ids = ours.strip_token_ids
    ref.prepend_space = ours.prepend_space
    return ours, ref


# --------------------------------------------------------------------------
# comparisons
# --------------------------------------------------------------------------


def norm_keys(found):
    """(ngram, score) list -> {ngram tuple: rounded score} (dedup keeps first,
    both sides deduplicate before this point)."""
    return {tuple(n): round(float(s), 2) for n, s in found}


def assert_same_keys(ours, ref, ctx=""):
    o, r = norm_keys(ours), norm_keys(ref)
    assert set(o) == set(r), (
        ctx, sorted(set(o) - set(r))[:5], sorted(set(r) - set(o))[:5],
    )
    for k in r:
        assert abs(o[k] - r[k]) <= 0.02, (ctx, k, o[k], r[k])


def assert_same_ranking(our_docs, ref_docs, ctx=""):
    """Ranked SEALDocument lists: same ids in the same order (allowing swaps
    only between docs whose scores are within numeric tolerance), same
    scores, same detokenized text."""
    assert len(our_docs) == len(ref_docs), ctx
    o_ids = [d.docid for d in our_docs]
    r_ids = [d.docid for d in ref_docs]
    r_scores = {d.docid: float(d.score) for d in ref_docs}
    o_scores = {d.docid: float(d.score) for d in our_docs}
    assert set(o_ids) == set(r_ids), (ctx, o_ids, r_ids)
    for i, (a, b) in enumerate(zip(o_ids, r_ids)):
        if a != b:  # tolerate order flips of numerically-tied docs only
            assert abs(r_scores[a] - r_scores[b]) < 1e-3, (ctx, i, o_ids, r_ids)
    for d in r_ids:
        ref_s, our_s = r_scores[d], o_scores[d]
        assert abs(our_s - ref_s) <= max(0.01, 0.01 * abs(ref_s)), (ctx, d, our_s, ref_s)
    for od, rd in zip(our_docs, ref_docs):
        if od.docid == rd.docid:
            assert od.text() == rd.text(), (ctx, od.docid)


def run_both(world, queries=QUERIES, k=5, **knobs):
    ours, ref = make_searchers(world, **knobs)
    our_res = ours.batch_search(list(queries), k=k)
    ref_res = ref.batch_search(list(queries), k=k)
    return ours, ref, our_res, ref_res


# --------------------------------------------------------------------------
# tests: key generation differential (per knob), then full batch_search
# --------------------------------------------------------------------------


def test_keygen_body_only(world):
    ours, ref = make_searchers(world)
    for q in QUERIES:
        o = ours.generate_keys(q)
        r = ref.generate_keys(q)
        assert len(r) >= 3, "reference produced too few keys -- weak fixture"
        assert_same_keys(o, r, ctx=q)


def test_keygen_no_markers_rescore(world):
    # use_markers=False routes through the global rescore branch
    # (retrieval.py:268-279) instead of per-decode rescoring
    ours, ref = make_searchers(world, use_markers=False)
    for q in QUERIES:
        assert_same_keys(ours.generate_keys(q), ref.generate_keys(q), ctx=q)


def test_keygen_no_rescore(world):
    ours, ref = make_searchers(world, rescore=False)
    for q in QUERIES:
        assert_same_keys(ours.generate_keys(q), ref.generate_keys(q), ctx=q)


def test_keygen_titles_and_decomposition(world):
    world = boost_words(world, [" " + t for _, t, _, _ in CORPUS])
    ours, ref = make_searchers(world, decode_titles=True, add_query_to_keys=True)
    for q in QUERIES:
        o, r = ours.generate_keys(q), ref.generate_keys(q)
        r_norm = norm_keys(r)
        assert any(
            k[0] == ours.title_bos_token_id for k in r_norm
        ), "no title keys -- weak fixture"
        assert_same_keys(o, r, ctx=q)


def test_keygen_code(world):
    # codes tokenize as [' c', '<digits>']; step 1 must pick ' c' (the only
    # token with continuations after '@@'), later steps the digit pieces
    world2 = boost_words(world, [" " + c for _, _, c, _ in CORPUS], amount=12.0)
    world2 = boost_words(world2, [" c"], amount=18.0)
    ours, ref = make_searchers(world2, decode_code=True, decode_body=False)
    for q in QUERIES:
        o, r = ours.generate_keys(q), ref.generate_keys(q)
        assert any(k[0] == ours.code_bos_token_id for k in norm_keys(r)), (
            "no code keys -- weak fixture"
        )
        assert_same_keys(o, r, ctx=q)


def test_keygen_unigrams(world):
    ours, ref = make_searchers(world, unigram_scores=True)
    for q in QUERIES:
        o_keys, o_us = ours.generate_keys(q)
        r_keys, r_us = ref.generate_keys(q)
        assert_same_keys(o_keys, r_keys, ctx=q)
        np.testing.assert_allclose(
            np.asarray(o_us), np.asarray(r_us), atol=2e-3, rtol=0
        )


def test_batch_search_default_pipeline(world):
    """The composed flagship: body decode + rescore + decomposition + titles
    + unigrams -> aggregation -> ranked docs with detokenized text."""
    world = boost_words(world, [" " + t for _, t, _, _ in CORPUS])
    ours, ref, our_res, ref_res = run_both(
        world,
        decode_titles=True,
        add_query_to_keys=True,
        unigram_scores=True,
    )
    for q, o, r in zip(QUERIES, our_res, ref_res):
        assert len(r) >= 2, "reference retrieved too few docs -- weak fixture"
        assert_same_ranking(o, r, ctx=q)
    # sanity: the soup query surfaces the soup doc (title boosting reshuffles
    # the LM evidence, so top-k membership, not top-1)
    assert "d0" in [d.docid for d in our_res[0]]


def test_batch_search_single_key_interpolation(world):
    ours, ref, our_res, ref_res = run_both(
        world, single_key=0.5, unigram_scores=True
    )
    for q, o, r in zip(QUERIES, our_res, ref_res):
        assert_same_ranking(o, r, ctx=q)


def test_batch_search_include_keys(world):
    # NOTE (genuine reference bug, documented in PARITY.md): the reference's
    # include_keys branch rebinds the `k` parameter (`for k, _ in kk:`,
    # retrieval.py:680), so its batch_search crashes on the SECOND query of a
    # multi-query batch with include_keys=True.  Drive it one query per call;
    # our implementation handles multi-query batches fine.
    ours, ref = make_searchers(world, include_keys=True)
    our_res = ours.batch_search(list(QUERIES), k=3)
    ref_res = [ref.batch_search([q], k=3)[0] for q in QUERIES]
    for o_docs, r_docs in zip(our_res, ref_res):
        for od, rd in zip(o_docs, r_docs):
            if od.docid != rd.docid:
                continue  # tied pair already validated by ranking checks
            o_keys = sorted((t, c, round(s, 2)) for t, c, s in od.keys)
            r_keys = sorted((t, c, round(s, 2)) for t, c, s in rd.keys)
            assert [k[:2] for k in o_keys] == [k[:2] for k in r_keys], od.docid
            for (t1, c1, s1), (t2, c2, s2) in zip(o_keys, r_keys):
                assert abs(s1 - s2) <= 0.02, (od.docid, t1, s1, s2)
