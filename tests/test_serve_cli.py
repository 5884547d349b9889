"""Streaming serve CLI end-to-end (JSONL in -> ranked JSONL out)."""

import io
import json

import numpy as np
import pytest

from seal_tpu.cli import build_fm_index as build_cli
from seal_tpu.cli import serve as serve_cli


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve")
    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(100)]
    rows = [
        ("s1", "Soup", "you can eat soup with a spoon but eating soup with a fork is hard"),
        ("s2", "Forks", "a fork is a utensil with tines used for spearing solid food"),
    ] + [
        (f"f{i}", f"Filler{i}", " ".join(rng.choice(words, size=35)))
        for i in range(40)
    ]
    (d / "corpus.tsv").write_text(
        "".join(f"{i}\t{t}\t{b}\n" for i, t, b in rows)
    )
    rc = build_cli.main(
        [str(d / "corpus.tsv"), str(d / "idx"), "--include_title", "--train_word_vocab"]
    )
    assert rc == 0
    return d


def test_adaptive_batches_flushes_on_idle_pipe():
    """A trickling client on a pipe gets its partial batch flushed instead
    of waiting for batch_size lines or EOF."""
    import os
    import threading

    from seal_tpu.utils.batching import adaptive_batches

    r_fd, w_fd = os.pipe()
    r = os.fdopen(r_fd, "r")
    w = os.fdopen(w_fd, "w")
    got = []
    done = threading.Event()

    def consume():
        for batch in adaptive_batches(r, lambda x: x.strip() or None, n=20):
            got.append(batch)
            if len(got) == 1:
                done.set()

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    w.write("one\n")
    w.flush()
    # pipe stays OPEN: the single line must still come through
    assert done.wait(timeout=10), "partial batch was not flushed while idle"
    assert got[0] == ["one"]
    w.close()
    t.join(timeout=10)
    r.close()


def test_adaptive_batches_stringio_fallback():
    from seal_tpu.utils.batching import adaptive_batches

    s = io.StringIO("a\nb\nc\n")
    batches = list(adaptive_batches(s, lambda x: x.strip() or None, n=2))
    assert batches == [["a", "b"], ["c"]]


def test_serve_jsonl_roundtrip(index_dir):
    d = index_dir
    queries = io.StringIO(
        json.dumps({"id": "q7", "query": "eating soup with a fork"}) + "\n"
        + "42\n"  # malformed: non-dict/non-string JSON -- must be skipped
        + json.dumps({"id": "nope"}) + "\n"  # malformed: no "query"
        + "spearing solid food utensil\n"  # bare-string form
    )
    out = io.StringIO()
    rc = serve_cli.main(
        [
            "--fm_index", str(d / "idx"),
            "--tokenizer", str(d / "idx.word_vocab.json"),
            "--backbone", "tiny-word", "--beam", "3", "--length", "3",
            "--hits", "2", "--dont_decode_titles", "--dont_unigram_scores",
        ],
        stdin=queries,
        stdout=out,
    )
    assert rc == 0
    lines = [json.loads(x) for x in out.getvalue().splitlines()]
    assert len(lines) == 2
    assert lines[0]["id"] == "q7"
    assert lines[0]["hits"] and lines[0]["hits"][0]["docid"] == "s1"
    assert "soup" in lines[0]["hits"][0]["text"]
    assert lines[1]["hits"][0]["docid"] == "s2"
