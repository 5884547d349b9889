"""Tokenizer tests: byte-level BPE roundtrips against HF `tokenizers` ground
truth (when constructible), and the word-vocab fallback."""

import json

import pytest

from seal_tpu.models.tokenizer import (
    ByteLevelBPETokenizer,
    WordVocabTokenizer,
    bytes_to_unicode,
    word_tokenize,
)


def _toy_bpe(tmp_path):
    """Train a tiny byte-level BPE with the HF `tokenizers` lib and dump
    vocab/merges files our implementation can load."""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import ByteLevelBPETokenizer as HFBBPE

    corpus = tmp_path / "corpus.txt"
    corpus.write_text(
        "can you eat soup with a fork\n"
        "soup is eaten with a spoon usually\n"
        "forks are for solid food items\n" * 20
    )
    hf = HFBBPE()
    hf.train(
        [str(corpus)],
        vocab_size=400,
        min_frequency=1,
        special_tokens=["<s>", "<pad>", "</s>", "<unk>", "<mask>"],
    )
    hf.save_model(str(tmp_path))
    return hf, str(tmp_path)


def test_bpe_matches_hf_tokenizers(tmp_path):
    hf, d = _toy_bpe(tmp_path)
    tok = ByteLevelBPETokenizer.from_dir(d)
    for text in [
        " can you eat soup with a fork",
        "soup soup soup",
        " unknown zzz symbols !!",
        "  double  spaces ",
    ]:
        expect = hf.encode(text).ids
        got = tok.encode_plain(text)
        assert got == expect, text
        assert tok.decode(got) == text


def test_bpe_specials(tmp_path):
    _, d = _toy_bpe(tmp_path)
    tok = ByteLevelBPETokenizer.from_dir(d)
    ids = tok.encode(" soup")
    assert ids[0] == tok.bos_token_id and ids[-1] == tok.eos_token_id
    assert tok.decode(ids, skip_special_tokens=True) == " soup"


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_word_vocab_tokenizer_roundtrip():
    texts = ["can you eat soup with a fork", "soup is eaten with a spoon"]
    tok = WordVocabTokenizer.train(texts, max_vocab=100)
    ids = tok.encode(" soup is eaten")
    assert ids[0] == 0 and ids[-1] == 2
    assert tok.decode(ids, skip_special_tokens=True) == " soup is eaten"
    # leading-space distinction survives
    a = tok.encode_plain(" soup")
    b = tok.encode_plain("soup")
    assert a != b
    # unknown words map to unk
    assert tok.encode_plain(" xylophone")[0] == tok.unk_token_id


def test_word_vocab_save_load(tmp_path):
    tok = WordVocabTokenizer.train(["hello world hello"], max_vocab=10)
    p = str(tmp_path / "word_vocab.json")
    tok.save(p)
    tok2 = WordVocabTokenizer.load(p)
    assert tok2.encode("hello world") == tok.encode("hello world")


def test_word_tokenize():
    assert word_tokenize("Can you eat soup-with a fork?") == [
        "Can", "you", "eat", "soup", "-", "with", "a", "fork", "?",
    ]


def test_trained_bpe_roundtrip_and_persistence(tmp_path):
    """The from-scratch BPE trainer: exact round-trips on training text,
    byte coverage for unseen input, and from_dir reload identity."""
    from seal_tpu.models.tokenizer import ByteLevelBPETokenizer

    texts = [
        " the theme of the soup is the fork",
        " soup and forks and themes repeat themes",
        " numbers 123 and punctuation, too!",
    ]
    tok = ByteLevelBPETokenizer.train(texts, vocab_size=400)
    assert len(tok.bpe_ranks) > 0
    for t in texts:
        ids = tok.encode_plain(t)
        assert tok.unk_token_id not in ids
        assert tok.decode(ids) == t
    # unseen word: byte coverage keeps it lossless
    assert tok.decode(tok.encode_plain(" zebra!")) == " zebra!"
    # specials in BART positions
    assert (tok.bos_token_id, tok.pad_token_id, tok.eos_token_id) == (0, 1, 2)
    tok.save(str(tmp_path / "bpe"))
    tok2 = ByteLevelBPETokenizer.from_dir(str(tmp_path / "bpe"))
    for t in texts:
        assert tok2.encode(t) == tok.encode(t)
