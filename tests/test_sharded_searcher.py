"""Full search pipeline against a mesh-sharded index (BASELINE config 5)."""

import numpy as np
import pytest

import jax

from seal_tpu.index import FMIndex
from seal_tpu.models import bart
from seal_tpu.models.config import bart_tiny
from seal_tpu.models.tokenizer import WordVocabTokenizer
from seal_tpu.parallel.sharded_index import UnionHostIndex, ShardedFMIndex
from seal_tpu.retrieval.searcher import SEALSearcher

CORPUS = [
    ("d0", "Soup", "You can eat soup with a spoon but eating soup with a fork is hard."),
    ("d1", "Forks", "A fork is a utensil with tines used for spearing solid food."),
    ("d2", "Bicycles", "A bicycle has two wheels and is propelled by pedals."),
    ("d3", "Rivers", "A river is a natural stream of fresh water flowing toward an ocean."),
    ("d4", "Chess", "Chess is a board game for two players with sixteen pieces each."),
]


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(0)
    filler_words = [f"word{i}" for i in range(80)]
    filler = [
        (f"f{i}", f"Filler{i}", " ".join(rng.choice(filler_words, size=30)))
        for i in range(19)  # 24 docs total -> 3 per shard on 8 shards
    ]
    corpus = CORPUS + filler
    texts = [f"{t} @@ {b}" for _, t, b in corpus]
    labels = [d for d, _, _ in corpus]
    tok = WordVocabTokenizer.train([" " + t for t in texts], max_vocab=500)
    docs = [tok.encode_plain(" " + t) + [tok.eos_token_id] for t in texts]
    cfg = bart_tiny(vocab_size=tok.vocab_size)
    params = bart.init_params(jax.random.PRNGKey(0), cfg)
    import jax.numpy as jnp

    bias = np.zeros(cfg.vocab_size, np.float32)
    for _, title, body in CORPUS:
        for t in tok.encode_plain(" " + title + " " + body.lower()) + tok.encode_plain(" " + body):
            bias[t] = 8.0
    params = dict(params)
    params["final_logits_bias"] = jnp.asarray(bias)
    return corpus, texts, labels, tok, docs, cfg, params


def test_union_host_index(world):
    corpus, texts, labels, tok, docs, cfg, params = world
    mono = FMIndex()
    mono.initialize(docs, labels=labels)
    si, hosts, assign = ShardedFMIndex.build(docs, n_shards=4, vocab=cfg.vocab_size,
                                            labels=labels)
    union = UnionHostIndex(hosts, assign, labels=labels)
    assert len(union) == len(mono)
    assert union.n_docs == mono.n_docs
    for g in range(len(docs)):
        assert union.get_doc(g) == mono.get_doc(g)
        assert union.get_doc_length(g) == mono.get_doc_length(g)
    rng = np.random.default_rng(1)
    for _ in range(20):
        d = docs[int(rng.integers(0, len(docs)))]
        i = int(rng.integers(0, len(d) - 2))
        pat = d[i : i + 2]
        # within-doc patterns: union count == monolithic count
        assert union.get_count(pat) == sum(h.get_count(pat) for h in hosts)
        ends, gdocs = union.occurrences(pat, 100)
        assert len(ends) == union.get_count(pat)
        # canonical ordering: the union's occurrence stream is IDENTICAL to
        # the monolithic index's (doc id asc, within-doc SA order) up to the
        # coordinate system -- union tok_ends live in shard-concatenation
        # coordinates, monolithic in corpus order, but within-doc offsets
        # (all the ranker's coverage logic consumes) are preserved.  This is
        # what makes sharded ranking == monolithic ranking end-to-end.
        m_ends, m_docs = mono.occurrences(pat, 100)
        np.testing.assert_array_equal(gdocs, m_docs)
        mono_b = np.asarray(mono.doc_boundaries())
        u_start = np.empty(len(docs), np.int64)
        for s, h in enumerate(hosts):
            hb = np.asarray(h.doc_boundaries())
            for local_g, global_g in enumerate(assign[s]):
                u_start[global_g] = union.offsets[s] + hb[local_g]
        np.testing.assert_array_equal(
            ends - u_start[gdocs], m_ends - mono_b[m_docs]
        )
        # every reported doc actually contains the pattern
        for g in set(gdocs.tolist()):
            doc_toks = union.get_doc(int(g))
            assert any(
                doc_toks[j : j + 2] == pat for j in range(len(doc_toks) - 1)
            )
    assert union.token_count(docs[0][0]) == sum(h.token_count(docs[0][0]) for h in hosts)


def test_sharded_search_finds_right_docs(world):
    corpus, texts, labels, tok, docs, cfg, params = world
    searcher = SEALSearcher.build_sharded(
        docs, labels, tok, cfg, params, n_shards=8,
        backbone="word-vocab", beam=4, length=4, batch_size=4,
        exact_mask=True, decode_body=False, decode_titles=False,
        unigram_scores=False,
    )
    res = searcher.batch_search(
        ["eating soup with a fork", "two wheels pedals bicycle"], k=3
    )
    assert res[0][0].docid == "d0"
    assert res[1][0].docid == "d2"
    title, _ = res[0][0].text()
    assert "Soup" in title


def test_sharded_generation_keys_grounded(world):
    corpus, texts, labels, tok, docs, cfg, params = world
    searcher = SEALSearcher.build_sharded(
        docs, labels, tok, cfg, params, n_shards=8,
        backbone="word-vocab", beam=4, length=4, batch_size=2,
        exact_mask=True, decode_titles=False, unigram_scores=False,
    )
    keys = searcher.generate_keys("eat soup with a fork")
    assert keys
    for ngram, score in keys:
        assert searcher.fm_index.get_count(list(ngram)) > 0


def test_shard_wise_build_and_manifest_load(tmp_path, world):
    """``build_fm_index --shards N`` writes per-shard indexes + manifest;
    ``SEALSearcher.load`` assembles sharded serving from them WITHOUT ever
    building the monolithic index (VERDICT r2 #4)."""
    import json
    import os

    from seal_tpu.cli.build_fm_index import main as build_main

    corpus, texts, labels, tok, docs, cfg, params = world
    tsv = tmp_path / "corpus.tsv"
    with open(tsv, "w") as f:
        for (d, title, body) in corpus:
            f.write(f"{d}\t{title}\t{body}\n")

    out_sharded = str(tmp_path / "idx_sharded")
    rc = build_main([
        str(tsv), out_sharded, "--include_title", "--train_word_vocab",
        "--shards", "4", "--jobs", "2",
    ])
    assert rc == 0
    manifest = json.load(open(out_sharded + ".manifest.json"))
    assert manifest["n_shards"] == 4 and manifest["n_docs"] == len(corpus)
    assert os.path.exists(out_sharded + ".shard003.fmi.npz")

    # monolithic build with the SAME trained vocab for comparison
    out_mono = str(tmp_path / "idx_mono")
    rc = build_main([
        str(tsv), out_mono, "--include_title",
        "--tokenizer", out_sharded + ".word_vocab.json",
    ])
    assert rc == 0

    common = dict(
        tokenizer_path=out_sharded + ".word_vocab.json",
        backbone="word-vocab-tiny",
        beam=3, length=3, batch_size=2,
        decode_body=False, decode_titles=False,
        add_query_to_keys=True, unigram_scores=False,
    )
    sharded = SEALSearcher.load(out_sharded, **common)
    assert sharded.sharded_index is not None
    assert sharded.fm_index.n_docs == len(corpus)
    mono = SEALSearcher.load(out_mono, **common)
    assert mono.sharded_index is None

    qs = ["eating soup with a fork", "fresh water river ocean"]
    rs = sharded.batch_search(qs, k=3)
    rm = mono.batch_search(qs, k=3)
    assert rs[0][0].docid == rm[0][0].docid == "d0"
    assert rs[1][0].docid == rm[1][0].docid == "d3"
    for a, b in zip(rs, rm):
        assert {d.docid for d in a} == {d.docid for d in b}
        for d in a:
            assert d.text() == next(x for x in b if x.docid == d.docid).text()

    # re-splitting a shard-wise build to a different count is refused
    with pytest.raises(ValueError, match="cannot re-split"):
        SEALSearcher.load(out_sharded, index_shards=2, **common)
