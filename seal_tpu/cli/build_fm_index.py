"""Index-builder CLI (parity: ``/root/reference/scripts/build_fm_index.py``).

TSV corpus -> cleaned text -> token ids -> FM-index files.

Formats: ``kilt`` = ``id<TAB>title<TAB>text``; ``dpr`` = csv with header and
``id,text,title`` columns.  With ``--include_title`` the document becomes
``"{title} {delim} {text}"`` (delim default ``@@``), which is what the
title-decoding path of the searcher keys on.

Tokenizers: ``--tokenizer`` accepts a dir with vocab.json+merges.txt (byte
BPE), a word_vocab.json, or an HF name (offline cache).  With
``--train_word_vocab`` a word-level vocab is trained from this corpus and
saved next to the index -- the network-free path used by tests/benchmarks.
"""

from __future__ import annotations

import argparse
import csv
import re
import sys


def clean_text(text: str) -> str:
    # reference build_fm_index.py:50-54 (ftfy unavailable offline; the
    # whitespace/BULLET/SECTION normalization is the load-bearing part)
    text = re.sub(r"\s+", " ", text)
    text = text.replace("BULLET::::", "").replace("SECTION::::", "")
    return text.strip()


def iter_corpus(path: str, fmt: str):
    """Yields (docid, title, text) rows."""
    with open(path, "r", 2**16) as f:
        if fmt == "dpr":
            next(f)
            reader = csv.reader(f, delimiter="\t", quotechar='"')
            for pp in reader:
                if len(pp) == 3:
                    yield pp[0], pp[2], pp[1]
        elif fmt == "kilt":
            for line in f:
                pp = line.strip().split("\t", 2)
                if len(pp) == 3:
                    yield pp[0], pp[1], pp[2]
        else:
            raise ValueError(fmt)


def preprocess(args, rows):
    from seal_tpu.models.tokenizer import word_tokenize

    for idx, title, text in rows:
        idx = idx.strip()
        title = title.strip()
        text = clean_text(text)
        if not text:
            continue
        if args.tokenize:
            title = " ".join(word_tokenize(title))
            text = " ".join(word_tokenize(text))
        if args.include_title and title:
            text = f"{title} {args.delim} {text}"
        if args.lowercase:
            text = text.lower()
        yield idx, text


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input")
    parser.add_argument("output")
    parser.add_argument("--jobs", type=int, default=1)
    parser.add_argument("--include_title", action="store_true")
    parser.add_argument("--delim", default="@@")
    parser.add_argument("--format", choices=["kilt", "dpr"], default="kilt")
    parser.add_argument("--tokenizer", default=None, type=str,
                        help="tokenizer dir / word_vocab.json / HF name")
    parser.add_argument("--hf_model", default=None, type=str,
                        help="alias of --tokenizer (reference flag name)")
    parser.add_argument("--train_word_vocab", action="store_true",
                        help="train a word-level vocab from this corpus")
    parser.add_argument("--max_vocab", type=int, default=50000)
    parser.add_argument("--lowercase", action="store_true")
    parser.add_argument("--tokenize", action="store_true")
    parser.add_argument("--in_memory", action="store_true",
                        help="keep tokenized docs in RAM instead of the "
                        "packed cache-file flow (reference default is the "
                        "cache file)")
    args = parser.parse_args(argv)
    print(args)

    from seal_tpu.index import FMIndex
    from seal_tpu.models.tokenizer import WordVocabTokenizer, load_tokenizer

    rows = list(preprocess(args, iter_corpus(args.input, args.format)))
    if not rows:
        print("no documents found", file=sys.stderr)
        return 1
    labels = [idx for idx, _ in rows]
    texts = [text for _, text in rows]

    if args.train_word_vocab:
        tokenizer = WordVocabTokenizer.train(
            [" " + t for t in texts], max_vocab=args.max_vocab
        )
        tokenizer.save(args.output + ".word_vocab.json")
        print(f"trained word vocab ({tokenizer.vocab_size} tokens)")
    else:
        tokenizer = load_tokenizer(args.tokenizer or args.hf_model)

    eos = tokenizer.eos_token_id
    sequences = (tokenizer.encode_plain(" " + t.strip()) + [eos] for t in texts)

    index = FMIndex()
    # cache-file flow (reference index.py:57-65): tokenized docs stream to a
    # packed temp file, so peak RAM is the text array + suffix-sort workspace
    index.initialize(sequences, in_memory=args.in_memory, labels=labels)
    index.save(args.output)
    print(f"indexed {index.n_docs} docs, {len(index)} tokens -> {args.output}.fmi.npz")
    return 0


if __name__ == "__main__":
    sys.exit(main())
