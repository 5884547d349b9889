"""The reference README's second use case (README.md:177-220): paraphrase /
substring mining with ``fm_index_generate`` directly -- generate corpus
substrings conditioned on an input sentence, with ``always_allow_eos`` so
generation can stop anywhere.
"""

import numpy as np
import pytest

import jax

from seal_tpu.decoding.generate import fm_index_generate, pad_batch
from seal_tpu.index import FMIndex
from seal_tpu.index.device_index import DeviceFMIndex
from seal_tpu.models import bart
from seal_tpu.models.config import bart_tiny
from seal_tpu.models.tokenizer import WordVocabTokenizer


def test_paraphrase_mining_flow():
    sentences = [
        "the cat sat on the mat",
        "a cat was sitting on a mat",
        "dogs chase cats around the yard",
        "the mat was under the cat",
    ]
    tok = WordVocabTokenizer.train([" " + s for s in sentences])
    docs = [tok.encode_plain(" " + s) + [tok.eos_token_id] for s in sentences]
    index = FMIndex()
    index.initialize(docs, labels=[str(i) for i in range(len(docs))])
    cfg = bart_tiny(vocab_size=tok.vocab_size)
    dev = DeviceFMIndex.from_host(index, vocab=tok.vocab_size)
    params = bart.init_params(jax.random.PRNGKey(0), cfg)

    query = tok.encode(" the cat sat on the mat")
    ids, mask = pad_batch([query], cfg.pad_token_id)
    out = fm_index_generate(
        cfg, params, dev, ids, mask,
        num_beams=5, max_length=8, min_length=0,
        always_allow_eos=True, forced_bos_token_id=None, exact_mask=True,
    )
    assert out[0]
    mined = set()
    for score, toks in out[0]:
        seq = toks[1:]
        cut = next((i for i, t in enumerate(seq) if t in (1, 2)), len(seq))
        seq = seq[:cut]
        if seq:
            assert index.get_count(seq) > 0  # every mined span is a corpus span
            mined.add(tok.decode(seq))
    assert len(mined) >= 5  # a diverse set of corpus substrings
