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


def test_serve_soak_sustained_mixed_stream(index_dir):
    """Sustained-run check (VERDICT r2 #10): a few hundred mixed well-formed/
    malformed lines arriving in bursts with idle gaps through a real pipe.
    Every valid query gets exactly one result line (no drops, no dupes, no
    worker death), and RSS stays flat once compilation settles -- the
    'restart IS the fault story' claim needs the long-running shape to not
    leak."""
    import os
    import threading
    import time

    import psutil

    d = index_dir
    r_fd, w_fd = os.pipe()
    out = io.StringIO()
    rc_box = {}

    stdin_f = os.fdopen(r_fd, "r")

    def run2():
        rc_box["rc"] = serve_cli.main(
            [
                "--fm_index", str(d / "idx"),
                "--tokenizer", str(d / "idx.word_vocab.json"),
                "--backbone", "tiny-word", "--beam", "3", "--length", "3",
                "--hits", "2", "--batch_size", "8",
                "--dont_decode_titles", "--dont_unigram_scores",
                "--dont_add_query_to_keys",
            ],
            stdin=stdin_f,
            stdout=out,
        )

    t = threading.Thread(target=run2, daemon=True)
    t.start()

    proc = psutil.Process()
    queries = ["eating soup with a fork", "spearing solid food utensil",
               "soup spoon", "fork tines"]
    rss_samples = []
    n_valid = 0
    w = os.fdopen(w_fd, "w")
    for burst in range(30):
        for j in range(10):
            k = burst * 10 + j
            if k % 7 == 3:
                w.write('{"id": "broken"}\n')  # malformed: no query
            elif k % 7 == 5:
                w.write("[1, 2]\n")  # malformed: non-dict/non-string
            elif k % 5 == 1:
                w.write(queries[k % len(queries)] + "\n")  # bare string
                n_valid += 1
            else:
                w.write(json.dumps({"id": f"q{k}", "query": queries[k % 4]}) + "\n")
                n_valid += 1
        w.flush()
        if burst % 3 == 2:
            time.sleep(0.15)  # idle gap: exercises the early-flush path
        rss_samples.append(proc.memory_info().rss)
    w.close()
    t.join(timeout=600)
    assert not t.is_alive(), "serve worker hung"
    assert rc_box.get("rc") == 0

    lines = [json.loads(x) for x in out.getvalue().splitlines()]
    assert len(lines) == n_valid, (len(lines), n_valid)
    explicit_ids = [ln["id"] for ln in lines if str(ln["id"]).startswith("q")]
    assert len(explicit_ids) == len(set(explicit_ids)), "duplicate results"
    for ln in lines:
        assert ln["hits"], ln  # every query retrieves something on this corpus

    # leak check: late-phase RSS must be flat vs mid-phase (compilation and
    # cache warm-up happen in the first bursts; 64 MiB slack for allocator noise)
    mid = sorted(rss_samples[12:18])[2]
    late = sorted(rss_samples[-6:])[2]
    assert late - mid < 64 * 2**20, (mid, late, late - mid)
