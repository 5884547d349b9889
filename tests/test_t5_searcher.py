"""T5 backbone through the full searcher (t5 token-constant branch)."""

import numpy as np
import pytest

import jax

from seal_tpu.index import FMIndex
from seal_tpu.models import t5
from seal_tpu.models.t5 import t5_tiny
from seal_tpu.retrieval.searcher import SEALSearcher


class IdTokenizer:
    """Maps word 'tN' <-> id N; T5 conventions (pad=0, eos=1)."""

    def __init__(self, vocab_size):
        self._v = vocab_size
        self.pad_token_id = 0
        self.eos_token_id = 1
        self.bos_token_id = 0
        self.unk_token_id = 0
        self.mask_token_id = 0

    @property
    def vocab_size(self):
        return self._v

    def __len__(self):
        return self._v

    def encode_plain(self, text):
        out = []
        for w in text.split():
            if w.startswith("t") and w[1:].isdigit():
                out.append(int(w[1:]))
        return out

    def encode(self, text, add_special_tokens=True):
        ids = self.encode_plain(text)
        return ids + [self.eos_token_id] if add_special_tokens else ids

    def decode(self, ids, skip_special_tokens=False):
        return " ".join(
            f"t{i}" for i in ids if not (skip_special_tokens and i < 2)
        )

    def batch_decode(self, seqs, **kw):
        return [self.decode(s, **kw) for s in seqs]


def test_t5_searcher_end_to_end():
    rng = np.random.default_rng(0)
    vocab = 80
    tok = IdTokenizer(vocab)
    docs = [rng.integers(2, vocab, size=14).tolist() + [1] for _ in range(3500)]
    index = FMIndex()
    index.initialize(docs, labels=[f"d{i}" for i in range(3500)])
    cfg = t5_tiny(vocab_size=vocab)
    params = t5.init_params(jax.random.PRNGKey(0), cfg)
    searcher = SEALSearcher(
        index, tok, cfg, params,
        backbone="t5-base", beam=3, length=3, batch_size=2,
        exact_mask=True, decode_titles=False, add_query_to_keys=False,
        unigram_scores=False, rescore=False,
    )
    assert searcher.strip_token_ids == (0, 1)  # t5 constants branch
    assert searcher.prepend_space is False
    q = " ".join(f"t{t}" for t in docs[0][:4])
    keys = searcher.generate_keys(q)
    assert keys
    for ngram, score in keys:
        assert index.get_count(list(ngram)) > 0
    docs_out = searcher.search(q, k=2)
    assert docs_out and docs_out[0].docid.startswith("d")
