"""Differential decode parity against the GENUINE reference beam-search loop.

Executes the actual ``constrained_beam_search`` + ``IndexBasedLogitsProcessor``
+ ``BeamSearchScorerWithMemory`` from ``/root/reference/seal/beam_search.py``
(torch), with the model calls backed by THIS repo's JAX BART through a
4.13-era HF-API shim -- both sides therefore run the identical model
function, isolating the decode-loop semantics (dual scoring, 2K selection,
first-K-non-EOS continuation, per-step candidate history, finalize) from
model parity (tested separately vs real HF BART in ``test_bart.py``).

The observable compared is what the searcher consumes: the set of
(score, token_sequence) hypotheses whose stripped key occurs in the corpus.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp
import jax

from seal_tpu.decoding.generate import fm_index_generate, pad_batch
from seal_tpu.index import FMIndex
from seal_tpu.index.device_index import DeviceFMIndex
from seal_tpu.models import bart
from seal_tpu.models.config import bart_tiny

REF = "/root/reference/seal"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not mounted"
)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_reference_differential import ref_beam_search  # noqa: E402


class _JaxModelShim:
    """The slice of the transformers==4.13 model surface the reference loop
    touches, backed by the repo's JAX BART (teacher-forced full re-decode
    each step; no KV cache -- tiny shapes)."""

    def __init__(self, cfg, params, enc_out, enc_mask):
        self.cfg = cfg
        self.params = params
        self.enc_out = enc_out
        self.enc_mask = enc_mask
        self.config = types.SimpleNamespace(
            pad_token_id=cfg.pad_token_id,
            eos_token_id=cfg.eos_token_id,
            is_encoder_decoder=True,
            output_scores=False,
            output_attentions=False,
            output_hidden_states=False,
            return_dict_in_generate=False,
        )

    def prepare_inputs_for_generation(self, input_ids, **kwargs):
        return {"decoder_input_ids": input_ids}

    def adjust_logits_during_generation(self, logits, cur_len):
        return logits

    def _update_model_kwargs_for_generation(self, outputs, model_kwargs, is_encoder_decoder=True):
        model_kwargs["past"] = None
        return model_kwargs

    def __call__(self, decoder_input_ids=None, return_dict=True, **kwargs):
        import torch

        ids = jnp.asarray(decoder_input_ids.cpu().numpy())
        logits = bart.decode_full(self.cfg, self.params, self.enc_out, self.enc_mask, ids)
        return types.SimpleNamespace(
            logits=torch.from_numpy(np.asarray(logits, np.float32))
        )


class _Identity:
    def __call__(self, input_ids, scores):
        return scores


class _StopAtLen:
    def __init__(self, max_length):
        self.max_length = max_length

    def __len__(self):
        return 1

    def __call__(self, input_ids, scores):
        return input_ids.shape[-1] >= self.max_length


def _ref_generate(bs_mod, cfg, params, host, queries_ids, queries_mask, K, L,
                  **proc_kwargs):
    import torch

    B = queries_ids.shape[0]
    enc = bart.encode(cfg, params, jnp.asarray(queries_ids), jnp.asarray(queries_mask))
    enc_t = jnp.repeat(jnp.asarray(enc), K, axis=0)
    mask_t = jnp.repeat(jnp.asarray(queries_mask), K, axis=0)
    model = _JaxModelShim(cfg, params, enc_t, mask_t)

    processor = bs_mod.IndexBasedLogitsProcessor(
        index=host,
        num_beams=K,
        pad_token_id=cfg.pad_token_id,
        eos_token_id=cfg.eos_token_id,
        forced_bos_token_id=None,
        **proc_kwargs,
    )
    scorer = bs_mod.BeamSearchScorerWithMemory(
        batch_size=B,
        num_beams=K,
        device=torch.device("cpu"),
        length_penalty=1.0,
        min_length=0,
        max_length=L,
    )
    input_ids = torch.full((B * K, 1), cfg.decoder_start_token_id, dtype=torch.long)
    bs_mod.constrained_beam_search(
        model,
        input_ids,
        scorer,
        logits_processor=_Identity(),
        constrained_decoding_processor=processor,
        stopping_criteria=_StopAtLen(L),
        pad_token_id=cfg.pad_token_id,
        eos_token_id=cfg.eos_token_id,
    )
    # reference extraction (beam_search.py:555-557), length_penalty=1.0
    out = []
    for b in scorer._beam_hyps:
        hyps = [
            (h[0] * h[1].size(0), h[1].tolist())
            for h in b.beams
            if h[0] > float("-inf")
        ]
        out.append(hyps)
    return out


def _observable(host, cfg, hyps):
    """The searcher's view of a hypothesis list: stripped keys with corpus
    support, first-occurrence deduplicated (``deduplicate``, reference
    ``keys.py:19`` -- both extraction orders are step-ascending then finals,
    so the same instance survives), scores rounded
    (decode_step-with-cache vs full-re-decode numerics).

    The reference additionally records constrained-INVALID candidates at
    their unconstrained scores when fewer than 2K valid candidates exist
    (its topk back-fills from -inf ties); those are either ungrounded (the
    count filter drops them, ``retrieval.py:91``) or strip to a key whose
    grounded prefix instance was recorded at an earlier step -- dedup keeps
    the shared instance either way.
    """
    keys = {}
    for score, toks in hyps:
        seq = [int(t) for t in toks[1:]]  # drop decoder_start
        cut = next(
            (i for i, t in enumerate(seq) if t in (cfg.pad_token_id, cfg.eos_token_id)),
            len(seq),
        )
        seq = tuple(seq[:cut])
        if seq and seq not in keys and host.get_count(list(seq)) > 0:
            keys[seq] = round(float(score), 2)
    return {(s, k) for k, s in keys.items()}


@pytest.mark.parametrize("seed", [0, 1])
def test_decode_loop_matches_reference(seed):
    bs_mod = ref_beam_search()
    rng = np.random.default_rng(seed)
    VOCAB = 60
    docs = [
        rng.integers(4, VOCAB, size=int(rng.integers(6, 20))).tolist() + [2]
        for _ in range(20)
    ]
    host = FMIndex()
    host.initialize(docs)
    dev = DeviceFMIndex.from_host(host, vocab=VOCAB)
    cfg = bart_tiny(vocab_size=VOCAB)
    params = bart.init_params(jax.random.PRNGKey(seed + 3), cfg)
    queries = [[0] + rng.integers(4, VOCAB, size=5).tolist() + [2] for _ in range(2)]
    ids, mask = pad_batch(queries, cfg.pad_token_id)
    K, L = 3, 5

    ref = _ref_generate(bs_mod, cfg, params, host, ids, mask, K, L)
    ours = fm_index_generate(
        cfg, params, dev, ids, mask,
        num_beams=K, max_length=L, min_length=0, forced_bos_token_id=None,
    )
    assert len(ref) == len(ours)
    for r, o in zip(ref, ours):
        r_keys, o_keys = _observable(host, cfg, r), _observable(host, cfg, o)
        assert r_keys, "reference produced no grounded keys -- bad fixture"
        assert r_keys == o_keys


def _constraint_violating(host, cfg, seq, stop_at_count=0, always_allow_eos=False):
    """True iff some token of ``seq`` was NOT allowed by the reference's own
    branch logic at its step -- i.e. the hypothesis can only exist as one of
    the -inf backfill candidates torch.topk emits when fewer than 2K allowed
    candidates exist (their identity is torch tie-order nondeterminism)."""
    for t, tok in enumerate(seq):
        if always_allow_eos and tok == cfg.eos_token_id:
            continue
        prefix = list(seq[:t])
        if t == 0:
            if tok not in set(host.occurring_distinct):
                return True
        else:
            count = host.get_count(prefix[:-1])
            if stop_at_count > 0 and count <= stop_at_count:
                if tok != cfg.eos_token_id:
                    return True
            elif host.get_count(prefix + [int(tok)]) == 0:
                return True
    return False


@pytest.mark.parametrize(
    "proc_kwargs,gen_kwargs",
    [
        ({"stop_at_count": 1, "always_allow_eos": True},
         {"stop_at_count": 1, "always_allow_eos": True}),
        ({"force_decoding_from": None}, {}),  # plain rerun at another seed
    ],
)
def test_decode_loop_matches_reference_branches(proc_kwargs, gen_kwargs):
    """The stop_at_count / always_allow_eos branch logic against the genuine
    reference processor + loop.

    With stop_at_count, many steps have fewer than 2K allowed candidates, so
    the reference's topk backfills from -inf ties -- candidates that VIOLATE
    its own constraint mask, selected by torch's undefined equal-value
    order, carried as beams at finite unconstrained scores.  Those cannot be
    (and should not be) reproduced; we assert our keys are exactly the
    reference's minus that class.
    """
    bs_mod = ref_beam_search()
    rng = np.random.default_rng(7)
    VOCAB = 60
    docs = [
        rng.integers(4, VOCAB, size=int(rng.integers(6, 20))).tolist() + [2]
        for _ in range(20)
    ]
    host = FMIndex()
    host.initialize(docs)
    dev = DeviceFMIndex.from_host(host, vocab=VOCAB)
    cfg = bart_tiny(vocab_size=VOCAB)
    params = bart.init_params(jax.random.PRNGKey(11), cfg)
    queries = [[0] + rng.integers(4, VOCAB, size=5).tolist() + [2] for _ in range(2)]
    ids, mask = pad_batch(queries, cfg.pad_token_id)
    K, L = 3, 5

    ref = _ref_generate(bs_mod, cfg, params, host, ids, mask, K, L, **proc_kwargs)
    ours = fm_index_generate(
        cfg, params, dev, ids, mask,
        num_beams=K, max_length=L, min_length=0, forced_bos_token_id=None,
        **gen_kwargs,
    )
    stop = gen_kwargs.get("stop_at_count", 0)
    eos_ok = gen_kwargs.get("always_allow_eos", False)
    for r, o in zip(ref, ours):
        r_keys, o_keys = _observable(host, cfg, r), _observable(host, cfg, o)
        assert o_keys <= r_keys
        for score, seq in r_keys - o_keys:
            assert _constraint_violating(
                host, cfg, seq, stop_at_count=stop, always_allow_eos=eos_ok
            ), (score, seq)
