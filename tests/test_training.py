"""Data-gen + trainer CLI + checkpoint tests."""

import json
import os
import random

import numpy as np
import pytest

import jax

from seal_tpu.training import checkpoint as ckpt
from seal_tpu.training import data_gen


def test_fuzz_ratio():
    assert data_gen.fuzz_ratio("soup", "soup") == 100
    assert data_gen.fuzz_ratio("soup", "xxxx") == 0
    assert 0 < data_gen.fuzz_ratio("eating soup", "eating soap") < 100


def test_span_iterator_skips_stopwords():
    toks = ["the", "soup", "is", "hot"]
    starts = [i for i, _ in data_gen.span_iterator(toks)]
    assert 0 not in starts  # "the" banned
    assert 1 in starts and 3 in starts


def test_extract_spans_deterministic():
    rng = random.Random(0)
    spans = list(
        data_gen.extract_spans(
            "You can eat soup with a spoon but eating soup with a fork is hard",
            "eating soup with a fork",
            n_samples=3, min_length=3, max_length=3, rng=rng,
        )
    )
    assert len(spans) == 3
    for s in spans:
        assert len(s.split()) <= 3


def test_supervised_dpr_pairs(tmp_path):
    data = [
        {
            "question": "who eats soup",
            "positive_ctxs": [
                {"text": "Soup is eaten with spoons by people", "title": "Soup",
                 "score": "1000", "passage_id": "p1"},
            ],
        }
    ]
    p = tmp_path / "dpr.json"
    p.write_text(json.dumps(data))
    pairs = list(
        data_gen.supervised_dpr_pairs(
            str(p), target="title", min_score=0, mark_target=True, mark_silver=True,
            min_score_gold=500, rng=random.Random(0),
        )
    )
    assert pairs == [("who eats soup || title || +", "Soup @@")]
    pairs = list(
        data_gen.supervised_dpr_pairs(
            str(p), target="span", min_score=0, min_length=2, max_length=2,
            rng=random.Random(0),
        )
    )
    assert len(pairs) == 1 and len(pairs[0][1].split()) <= 2
    # code target with id2code
    pairs = list(
        data_gen.supervised_dpr_pairs(
            str(p), target="code", min_score=0, id2code={"p1": "c42"},
            mark_target=True, rng=random.Random(0),
        )
    )
    assert pairs == [("who eats soup || code", "c42 ||")]


def test_supervised_kilt_pairs(tmp_path):
    kb_file = tmp_path / "kb.tsv"
    kb_file.write_text("12-3\tSoup\tSoup is eaten with spoons\n")
    kb = data_gen.load_kilt_kb(str(kb_file), use_cache=False)
    assert kb == {"12-3": ("Soup", "Soup is eaten with spoons")}

    inp = tmp_path / "kilt.jsonl"
    inp.write_text(
        json.dumps(
            {
                "id": "q1",
                "input": "who eats\nsoup",
                "output": [
                    {"provenance": [{"wikipedia_id": "12", "start_paragraph_id": 3}]}
                ],
            }
        )
        + "\n"
    )
    pairs = list(
        data_gen.supervised_kilt_pairs(
            str(inp), kb, target="title", mark_target=True, rng=random.Random(0)
        )
    )
    assert pairs == [("who eats / soup || title", "Soup @@")]


def test_unsupervised_pairs():
    rows = [("1", "alpha beta gamma delta epsilon zeta eta theta", "Greek")]
    rng = random.Random(0)
    pairs = list(
        data_gen.unsupervised_pairs(
            rows, num_samples=2, num_title_samples=1, full_doc_n=1,
            min_length_input=2, max_length_input=2,
            min_length_output=2, max_length_output=2, rng=rng,
        )
    )
    assert pairs[0] == ("alpha beta gamma delta epsilon zeta eta theta || title", "Greek @@")
    assert len(pairs) >= 3
    for s, t in pairs:
        assert "||" in s


def test_write_pairs_leading_space(tmp_path):
    out = str(tmp_path / "data")
    data_gen.write_pairs([("a b", "c d")], out)
    assert open(out + ".source").read() == " a b\n"
    assert open(out + ".target").read() == " c d\n"


def test_checkpoint_roundtrip(tmp_path):
    params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3), "b": np.zeros(3)}
    opt = {"mu": {"w": np.ones((2, 3)), "b": np.ones(3)}}
    path = str(tmp_path / "ckpt")
    ckpt.save_checkpoint(path, 100, params, opt)
    ckpt.save_checkpoint(path, 200, params, opt)
    assert ckpt.latest_step(path) == 200
    step, state = ckpt.restore_checkpoint(path, {"params": params, "opt_state": opt})
    assert step == 200
    np.testing.assert_array_equal(np.asarray(state["params"]["w"]), params["w"])


def test_checkpoint_pruning(tmp_path):
    params = {"w": np.zeros(2)}
    path = str(tmp_path / "ckpt")
    for s in (10, 20, 30, 40):
        ckpt.save_checkpoint(path, s, params, keep=2)
    kept = sorted(d for d in os.listdir(path) if d.startswith("step_"))
    assert len(kept) == 2


def test_train_cli_end_to_end(tmp_path):
    """Smoke the full trainer CLI on a tiny word-vocab dataset."""
    from seal_tpu.cli import train as train_cli
    from seal_tpu.models.tokenizer import WordVocabTokenizer

    texts = ["alpha beta gamma", "delta epsilon zeta", "eta theta iota"]
    tok = WordVocabTokenizer.train([" " + t for t in texts])
    tok_path = str(tmp_path / "word_vocab.json")
    tok.save(tok_path)
    src = tmp_path / "train.source"
    tgt = tmp_path / "train.target"
    src.write_text("".join(f" {t} || body\n" for t in texts * 4))
    tgt.write_text("".join(f" {t}\n" for t in texts * 4))

    rc = train_cli.main(
        [
            str(tmp_path / "train"), str(tmp_path / "save"),
            "--tokenizer", tok_path, "--backbone", "tiny",
            "--batch_size", "4", "--max_update", "6",
            "--save_interval", "5", "--log_interval", "2", "--lr", "1e-3",
        ]
    )
    assert rc == 0
    assert ckpt.latest_step(str(tmp_path / "save")) == 6


def test_train_cli_resume(tmp_path):
    from seal_tpu.cli import train as train_cli
    from seal_tpu.models.tokenizer import WordVocabTokenizer

    texts = ["alpha beta gamma", "delta epsilon zeta"]
    tok = WordVocabTokenizer.train([" " + t for t in texts])
    tok_path = str(tmp_path / "word_vocab.json")
    tok.save(tok_path)
    (tmp_path / "train.source").write_text("".join(f" {t} || body\n" for t in texts * 4))
    (tmp_path / "train.target").write_text("".join(f" {t}\n" for t in texts * 4))

    common = [
        str(tmp_path / "train"), str(tmp_path / "save"),
        "--tokenizer", tok_path, "--backbone", "tiny",
        "--batch_size", "8", "--save_interval", "100", "--log_interval", "100",
    ]
    assert train_cli.main(common + ["--max_update", "3"]) == 0
    assert ckpt.latest_step(str(tmp_path / "save")) == 3
    assert train_cli.main(common + ["--max_update", "6", "--resume"]) == 0
    assert ckpt.latest_step(str(tmp_path / "save")) == 6


def test_phase_timer():
    from seal_tpu.utils.profiling import PhaseTimer

    t = PhaseTimer(enabled=True)
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    assert t.counts == {"a": 2, "b": 1}
    assert "a=" in t.summary() and "b=" in t.summary()
    t2 = PhaseTimer(enabled=False)
    with t2.phase("x"):
        pass
    assert t2.totals == {}
