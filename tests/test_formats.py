"""Topic iterators and output writers (data/formats.py)."""

import json

import pytest

from seal_tpu.data.formats import (
    OutputFormat,
    TopicsFormat,
    get_output_writer,
    get_query_iterator,
)
from seal_tpu.retrieval.document import SEALDocument


class FakeTokenizer:
    def decode(self, ids, skip_special_tokens=False):
        return " ".join(f"w{i}" for i in ids)


class FakeIndex:
    labels = ["12-3", "45-6-7", "99"]

    def get_doc(self, idx):
        return [10, 49314, 20, 21, 2]  # title @@ body eos


def make_doc(idx, score, query=None):
    d = SEALDocument(
        idx, score, FakeIndex(), FakeTokenizer(), delim1=49314, delim2=None, query=query
    )
    return d


# ------------------------------------------------------------------ iterators


def test_default_iterator(tmp_path):
    p = tmp_path / "topics.tsv"
    p.write_text("q1\twho is it\nq2\twhat is that\n")
    it = get_query_iterator(str(p), TopicsFormat.DEFAULT)
    assert list(it) == [("q1", "who is it"), ("q2", "what is that")]
    assert len(it) == 2


def test_dpr_qas_iterator(tmp_path):
    p = tmp_path / "qas.tsv"
    p.write_text('who?\t["a", "b"]\n')
    it = get_query_iterator(str(p), TopicsFormat.DPR_QAS)
    assert list(it) == [(0, "who?")]
    assert it.topics[0]["answers"] == ["a", "b"]


def test_nq_iterator(tmp_path):
    p = tmp_path / "nq.jsonl"
    p.write_text(json.dumps({"example_id": 7, "question_text": "why?"}) + "\n")
    it = get_query_iterator(str(p), TopicsFormat.NQ)
    assert list(it) == [(7, "why?")]


def test_kilt_template_iterator(tmp_path):
    p = tmp_path / "kt.jsonl"
    p.write_text(
        json.dumps(
            {"id": "x", "input": "raw", "meta": {"template_questions": ["templated?"]}}
        )
        + "\n"
    )
    it = get_query_iterator(str(p), TopicsFormat.KILT_TEMPLATE)
    assert list(it) == [("x", "templated?")]


# -------------------------------------------------------------------- writers


def test_trec_writer(tmp_path):
    out = tmp_path / "o.trec"
    w = get_output_writer(str(out), OutputFormat.TREC, max_hits=10, tag="t")
    with w:
        w.write("q1", [make_doc(0, 3.5), make_doc(2, 1.25)])
    lines = out.read_text().splitlines()
    assert lines[0] == "q1 Q0 12-3 1 3.500000 t"
    assert lines[1] == "q1 Q0 99 2 1.250000 t"


def test_msmarco_writer_max_hits(tmp_path):
    out = tmp_path / "o.tsv"
    w = get_output_writer(str(out), OutputFormat.MSMARCO, max_hits=1)
    with w:
        w.write("q1", [make_doc(0, 3.5), make_doc(2, 1.0)])
    assert out.read_text() == "q1\t12-3\t1\n"


def test_kilt_writer_provenance(tmp_path):
    out = tmp_path / "o.jsonl"
    w = get_output_writer(str(out), OutputFormat.KILT, max_hits=10)
    with w:
        w.write("q1", [make_doc(0, 2.0, query="the query"), make_doc(1, 1.0)])
    obj = json.loads(out.read_text())
    assert obj["id"] == "q1"
    assert obj["input"] == "the query"
    prov = obj["output"][0]["provenance"]
    assert prov[0]["wikipedia_id"] == 12
    assert prov[0]["start_paragraph_id"] == 3
    assert prov[1]["wikipedia_id"] == 45
    assert prov[1]["start_paragraph_id"] == 6
    assert prov[1]["end_paragraph_id"] == 7
    assert "@@" in prov[0]["text"]


def test_dpr_writer_dumps_on_exit(tmp_path):
    out = tmp_path / "o.json"
    topics = {0: {"question": "who?", "answers": ["x"]}}
    w = get_output_writer(str(out), OutputFormat.DPR, max_hits=5, topics=topics)
    with w:
        w.write(0, [make_doc(0, 2.0)])
    data = json.loads(out.read_text())
    assert data[0]["question"] == "who?"
    assert data[0]["ctxs"][0]["passage_id"] == "12-3"
    assert data[0]["ctxs"][0]["score"] == 2.0


def test_max_passage_collapsing(tmp_path):
    out = tmp_path / "o.trec"
    w = get_output_writer(
        str(out), OutputFormat.TREC, max_hits=10, tag="t",
        use_max_passage=True, max_passage_delimiter="-", max_passage_hits=10,
    )
    with w:
        # docids 12-3 and 12-9 collapse to parent 12
        class FI(FakeIndex):
            labels = ["12-3", "12-9", "99"]

        docs = [
            SEALDocument(i, s, FI(), FakeTokenizer(), delim1=49314)
            for i, s in ((0, 3.0), (1, 2.0), (2, 1.0))
        ]
        w.write("q1", docs)
    lines = out.read_text().splitlines()
    assert len(lines) == 2
    assert lines[0].split()[2] == "12"
    assert lines[1].split()[2] == "99"
