"""Both CLIs end-to-end: build from TSV (kilt + dpr formats), search with
dpr topics and dpr/kilt output formats -- the reference's NQ/KILT usage shape
(README.md:76-83) on the sample fixtures."""

import json
import os

import numpy as np
import pytest

from seal_tpu.cli import build_fm_index as build_cli
from seal_tpu.cli import search as search_cli


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(100)]
    rows = [
        ("11-1", "Soup", "you can eat soup with a spoon but eating soup with a fork is hard"),
        ("12-1", "Forks", "a fork is a utensil with tines used for spearing solid food"),
        ("13-2", "Bicycles", "a bicycle has two wheels and is propelled by pedals"),
    ] + [
        (f"9{i}-0", f"Filler{i}", " ".join(rng.choice(words, size=35)))
        for i in range(40)
    ]
    kilt_tsv = d / "corpus.tsv"
    kilt_tsv.write_text("".join(f"{i}\t{t}\t{b}\n" for i, t, b in rows))
    dpr_csv = d / "corpus_dpr.tsv"
    dpr_csv.write_text(
        "id\ttext\ttitle\n" + "".join(f"{i}\t{b}\t{t}\n" for i, t, b in rows)
    )
    topics = d / "topics.json"
    topics.write_text(
        json.dumps(
            [
                {"question": "eating soup with a fork", "answers": ["no"]},
                {"question": "bicycle wheels and pedals", "answers": ["yes"]},
            ]
        )
    )
    return d, rows


def test_build_kilt_and_dpr_formats_agree(corpus_dir):
    d, rows = corpus_dir
    rc = build_cli.main(
        [str(d / "corpus.tsv"), str(d / "idx_kilt"), "--include_title",
         "--train_word_vocab"]
    )
    assert rc == 0
    rc = build_cli.main(
        [str(d / "corpus_dpr.tsv"), str(d / "idx_dpr"), "--format", "dpr",
         "--include_title", "--train_word_vocab"]
    )
    assert rc == 0
    from seal_tpu.index import FMIndex

    a = FMIndex.load(str(d / "idx_kilt"))
    b = FMIndex.load(str(d / "idx_dpr"))
    assert a.labels == b.labels
    np.testing.assert_array_equal(a.text, b.text)


def test_search_cli_dpr_topics_dpr_output(corpus_dir):
    d, rows = corpus_dir
    out = d / "out.json"
    rc = search_cli.main(
        [
            "--topics", str(d / "topics.json"), "--topics_format", "dpr",
            "--output", str(out), "--output_format", "dpr", "--hits", "3",
            "--fm_index", str(d / "idx_kilt"),
            "--tokenizer", str(d / "idx_kilt.word_vocab.json"),
            "--backbone", "tiny-word", "--beam", "3", "--length", "3",
            "--exact_mask", "--dont_decode_titles", "--dont_unigram_scores",
            "--hybrid", "ensemble",  # reference CLI surface: accepted, no-op
        ]
    )
    assert rc == 0
    data = json.loads(out.read_text())
    assert len(data) == 2
    assert data[0]["question"] == "eating soup with a fork"
    ctxs = data[0]["ctxs"]
    assert ctxs and ctxs[0]["passage_id"] == "11-1"
    assert "soup" in ctxs[0]["text"]
    assert data[1]["ctxs"][0]["passage_id"] == "13-2"


def test_search_cli_sharded_index(corpus_dir):
    """--index_shards N re-partitions a loaded monolithic index over the
    device mesh (BASELINE config 5 from the CLI)."""
    d, rows = corpus_dir
    out = d / "out_sharded.json"
    rc = search_cli.main(
        [
            "--topics", str(d / "topics.json"), "--topics_format", "dpr",
            "--output", str(out), "--output_format", "dpr", "--hits", "3",
            "--fm_index", str(d / "idx_kilt"),
            "--tokenizer", str(d / "idx_kilt.word_vocab.json"),
            "--backbone", "tiny-word", "--beam", "3", "--length", "3",
            "--exact_mask", "--dont_decode_titles", "--dont_unigram_scores",
            "--index_shards", "4",
        ]
    )
    assert rc == 0
    data = json.loads(out.read_text())
    assert data[0]["ctxs"] and data[0]["ctxs"][0]["passage_id"] == "11-1"
    assert data[1]["ctxs"][0]["passage_id"] == "13-2"


def test_search_cli_kilt_output(corpus_dir):
    d, rows = corpus_dir
    topics = d / "topics.tsv"
    topics.write_text("q1\teating soup with a fork\n")
    out = d / "out.kilt"
    rc = search_cli.main(
        [
            "--topics", str(topics), "--output", str(out),
            "--output_format", "kilt", "--hits", "2",
            "--fm_index", str(d / "idx_kilt"),
            "--tokenizer", str(d / "idx_kilt.word_vocab.json"),
            "--backbone", "tiny-word", "--beam", "3", "--length", "3",
            "--exact_mask", "--dont_decode_titles", "--dont_unigram_scores",
        ]
    )
    assert rc == 0
    obj = json.loads(out.read_text())
    prov = obj["output"][0]["provenance"]
    assert prov[0]["wikipedia_id"] == 11
    assert prov[0]["start_paragraph_id"] == 1
    assert "@@" in prov[0]["text"]
