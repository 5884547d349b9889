"""Streaming serving CLI: ``python -m seal_tpu.cli.serve``.

Reads queries as JSON lines (``{"id": ..., "query": ...}``; bare strings
also accepted) from stdin or ``--input``, batches them to the searcher's
``batch_size``, and emits one JSON result line per query:

    {"id": ..., "query": ..., "hits": [{"docid", "score", "title", "text"}]}

Serving metrics (queries/sec, keys/sec, phase totals) are logged on exit.
The reference has no serving entry point (its CLI is batch evaluation
only); this is the long-running-worker shape: stateless, index loaded once,
one jitted program reused for every batch -- restart/reload IS the
fault-recovery story.
"""

from __future__ import annotations

import argparse
import json
import sys


def _iter_queries(stream):
    for n, line in enumerate(stream):
        line = line.strip()
        if not line:
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            obj = line
        if isinstance(obj, str):
            yield {"id": n, "query": obj}
        else:
            yield {"id": obj.get("id", n), "query": obj["query"]}


def _chunks(it, n):
    buf = []
    for x in it:
        buf.append(x)
        if len(buf) == n:
            yield buf
            buf = []
    if buf:
        yield buf


def main(argv=None, stdin=None, stdout=None):
    from seal_tpu.retrieval.searcher import SEALSearcher

    parser = argparse.ArgumentParser()
    parser.add_argument("--input", type=str, default=None,
                        help="JSONL query file (default: stdin)")
    parser.add_argument("--output", type=str, default=None,
                        help="JSONL results file (default: stdout)")
    parser.add_argument("--hits", type=int, default=10)
    SEALSearcher.add_args(parser)
    args = parser.parse_args(argv)

    searcher = SEALSearcher.from_args(args)
    stdin = stdin if stdin is not None else (
        open(args.input) if args.input else sys.stdin
    )
    stdout = stdout if stdout is not None else (
        open(args.output, "w") if args.output else sys.stdout
    )

    try:
        for batch in _chunks(_iter_queries(stdin), searcher.batch_size):
            results = searcher.batch_search([q["query"] for q in batch], k=args.hits)
            for q, docs in zip(batch, results):
                hits = []
                for d in docs:
                    title, body = d.text()
                    hit = {"docid": d.docid, "score": d.score,
                           "title": title.strip(), "text": body.strip()}
                    if d.keys is not None:
                        hit["keys"] = d.keys
                    hits.append(hit)
                stdout.write(json.dumps({"id": q["id"], "query": q["query"],
                                         "hits": hits}) + "\n")
            stdout.flush()
    finally:
        searcher.metrics.log_snapshot()
    return 0


if __name__ == "__main__":
    sys.exit(main())
