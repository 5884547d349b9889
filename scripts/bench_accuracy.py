"""Retrieval-accuracy benchmark across constraint modes (VERDICT round-1
item 6: measure accuracy, not hypothesis overlap).

Trains ``bart_tiny`` on supervised (query -> span) pairs over a synthetic
topical corpus, then reports acc@1/5/20 of full ``batch_search`` for:

* the default exact proposal loop (provably == dense reference masks),
* the round-1 speculative mode at default (256/128) and quarter (64/32)
  budgets,
* the corpus-sharded decoder on an 8-way virtual CPU mesh (exact mode).

Runs on CPU; ~5 minutes.  Results are recorded in PARITY.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from seal_tpu.index import FMIndex
    from seal_tpu.models.config import bart_tiny
    from seal_tpu.models.tokenizer import WordVocabTokenizer
    from seal_tpu.retrieval.searcher import SEALSearcher
    from seal_tpu.training import trainer

    rng = np.random.default_rng(0)
    # confusable topics: unordered word pairs from a small pool, so ranking
    # has to separate documents that share half their key vocabulary
    pool = [f"theme{i}" for i in range(12)]
    topics = [f"{pool[i]} {pool[j]}" for i in range(12) for j in range(i + 1, 12)][:64]
    n_topics = len(topics)
    filler = [f"w{i}" for i in range(400)]
    bodies = {
        t: f"all about {t} and the {t} facts "
        + " ".join(rng.choice(filler, size=40))
        for t in topics
    }
    texts = [f"{t.title()} @@ {bodies[t]}" for t in topics]
    # distractor docs push corpus size so the log-odds prior is meaningful
    texts += [
        f"Filler{i} @@ " + " ".join(rng.choice(filler, size=50)) for i in range(300)
    ]
    labels = [f"t{i}" for i in range(n_topics)] + [f"f{i}" for i in range(300)]
    gold = dict(zip(topics, labels[:n_topics]))
    queries = {t: f"tell me about {t} please" for t in topics}

    tok = WordVocabTokenizer.train(
        [" " + x for x in texts] + [" " + q + " || body || +" for q in queries.values()]
    )
    docs = [tok.encode_plain(" " + x) + [tok.eos_token_id] for x in texts]
    index = FMIndex()
    index.initialize(docs, labels=labels)
    print(f"# corpus: {len(index)} tokens, {index.n_docs} docs", file=sys.stderr)

    cfg = bart_tiny(vocab_size=tok.vocab_size)
    tcfg = trainer.TrainConfig(learning_rate=3e-3, warmup_steps=10, total_steps=4000)
    params, opt_state = trainer.init_train_state(cfg, tcfg, jax.random.PRNGKey(0))
    step_fn, _ = trainer.make_train_step(cfg, tcfg)
    step_fn = jax.jit(step_fn)

    pairs = []
    for t in topics:
        src = tok.encode(" " + queries[t] + " || body || +")
        tgt = tok.encode_plain(f" all about {t} and the {t}")
        pairs.append((src, tgt))

    def batch_of(idxs):
        ls = max(len(pairs[i][0]) for i in idxs)
        lt = max(len(pairs[i][1]) for i in idxs) + 1
        b = {
            "src_ids": np.full((len(idxs), ls), cfg.pad_token_id, np.int32),
            "src_mask": np.zeros((len(idxs), ls), np.int32),
            "tgt_in": np.full((len(idxs), lt), cfg.pad_token_id, np.int32),
            "tgt_out": np.full((len(idxs), lt), cfg.pad_token_id, np.int32),
        }
        for r, i in enumerate(idxs):
            s, t = pairs[i]
            b["src_ids"][r, : len(s)] = s
            b["src_mask"][r, : len(s)] = 1
            b["tgt_in"][r, 0] = cfg.decoder_start_token_id
            b["tgt_in"][r, 1 : len(t) + 1] = t
            b["tgt_out"][r, : len(t)] = t
        return b

    t0 = time.time()
    loss = None
    for step in range(int(os.environ.get("ACC_TRAIN_STEPS", 150))):
        idxs = rng.choice(len(pairs), size=8).tolist()
        params, opt_state, loss = step_fn(params, opt_state, batch_of(idxs))
    print(f"# trained in {time.time()-t0:.0f}s, loss {float(loss):.2f}",
          file=sys.stderr)

    common = dict(
        backbone="word-vocab",
        beam=6,
        length=6,
        batch_size=8,
        decode_titles=False,
        add_query_to_keys=False,
        unigram_scores=False,
        min_length=0,
    )
    qlist = [queries[t] for t in topics]

    def accuracy(searcher):
        res = searcher.batch_search(qlist, k=20)
        acc = {1: 0, 5: 0, 20: 0}
        for t, hits in zip(topics, res):
            ids = [h.docid for h in hits]
            for k in acc:
                acc[k] += int(gold[t] in ids[:k])
        return {k: v / n_topics for k, v in acc.items()}

    modes = {}
    modes["exact (default)"] = accuracy(
        SEALSearcher(index, tok, cfg, params, **common)
    )
    modes["speculative 256/128"] = accuracy(
        SEALSearcher(index, tok, cfg, params, speculative=True,
                     top_m=256, window=128, **common)
    )
    modes["speculative 64/32"] = accuracy(
        SEALSearcher(index, tok, cfg, params, speculative=True,
                     top_m=64, window=32, **common)
    )

    # sharded exact over an 8-way virtual mesh
    from seal_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(n_data=8, n_model=1, devices=jax.devices()[:8])
    sharded = SEALSearcher.build_sharded(
        docs, labels, tok, cfg, params, mesh=mesh, n_shards=8, **common
    )
    modes["sharded exact (8 shards)"] = accuracy(sharded)

    print(f"{'mode':<28} acc@1   acc@5   acc@20")
    for name, acc in modes.items():
        print(f"{name:<28} {acc[1]:.3f}   {acc[5]:.3f}   {acc[20]:.3f}")


def main_large():
    """Order-of-magnitude scale-up (VERDICT r2 #7): ~1M-token corpus, 595
    derived topics, a trained from-scratch byte-BPE vocab, a 6-layer model
    trained in-script; acc@1/5/20 for exact vs sharded vs compact index
    modes plus the EXECUTED-reference-ranker oracle on the same keys.
    Runs on CPU; ~15-25 minutes.  Results recorded in PARITY.md.
    """
    import dataclasses

    import jax

    jax.config.update("jax_platforms", "cpu")

    from seal_tpu.index import FMIndex
    from seal_tpu.models.config import bart_tiny
    from seal_tpu.models.tokenizer import ByteLevelBPETokenizer
    from seal_tpu.retrieval.searcher import SEALSearcher
    from seal_tpu.training import trainer

    rng = np.random.default_rng(0)
    pool = [f"theme{i}" for i in range(35)]
    pairs_ab = [(pool[i], pool[j]) for i in range(35) for j in range(i + 1, 35)][:595]
    topics = [f"{a} {b}" for a, b in pairs_ab]
    n_topics = len(topics)
    filler = [f"word{i}" for i in range(1200)]
    texts = [
        f"{t.title()} @@ all about {t} and the {t} facts "
        + " ".join(rng.choice(filler, size=60))
        for t in topics
    ]
    n_fill = 4200
    # distractor keys shared across docs (round-3 verdict: de-saturate):
    # a third of the filler docs embed PARTIAL gold phrases ("all about X" /
    # "the Y facts" for random themes), so short or single-theme keys no
    # longer separate gold from filler -- ranking must aggregate the full
    # two-theme phrase via stage-2 coverage
    fill_texts = []
    for i in range(n_fill):
        body = " ".join(rng.choice(filler, size=230))
        if i % 3 == 0:
            x, y = rng.choice(pool, size=2, replace=False)
            parts = body.split()
            parts.insert(rng.integers(0, 100), f"all about {x} and")
            parts.insert(rng.integers(100, 200), f"the {y} facts")
            body = " ".join(parts)
        fill_texts.append(f"Filler{i} @@ {body}")
    texts += fill_texts
    labels = [f"t{i}" for i in range(n_topics)] + [f"f{i}" for i in range(n_fill)]
    gold = dict(zip(topics, labels[:n_topics]))
    # TRAIN conditioning: one canonical template.  EVAL queries paraphrase
    # and reorder (half the pairs swap theme order; four templates) so the
    # decoder sees conditioning it never trained on -- key generation gets
    # noisy exactly the way a real query distribution is.
    eval_templates = [
        "tell me about {a} {b} please",
        "what do you know about {b} and {a}",
        "{a} {b} information needed",
        "please find facts regarding {b} {a}",
    ]
    queries = {}
    for qi, ((a, b), t) in enumerate(zip(pairs_ab, topics)):
        queries[t] = eval_templates[qi % 4].format(a=a, b=b)
    train_queries = {t: f"tell me about {t} please" for t in topics}

    t0 = time.time()
    tok = ByteLevelBPETokenizer.train(
        [" " + x for x in texts[: n_topics + 400]]
        + [" " + q + " || body || +" for q in list(train_queries.values())[:100]]
        + [" " + q for q in list(queries.values())[:100]],
        vocab_size=4000,
    )
    print(f"# BPE vocab {tok.vocab_size} trained in {time.time()-t0:.0f}s",
          file=sys.stderr)

    t0 = time.time()
    docs = [tok.encode_plain(" " + x) + [tok.eos_token_id] for x in texts]
    index = FMIndex()
    index.initialize(docs, labels=labels)
    print(f"# corpus: {len(index)} tokens, {index.n_docs} docs "
          f"(build {time.time()-t0:.0f}s)", file=sys.stderr)

    cfg = dataclasses.replace(
        bart_tiny(vocab_size=tok.vocab_size),
        d_model=128, encoder_layers=3, decoder_layers=3,
        encoder_attention_heads=8, decoder_attention_heads=8,
        encoder_ffn_dim=512, decoder_ffn_dim=512,
        max_position_embeddings=128,
    )
    # 1e-3, NOT the small bench's 3e-3: at this width/depth 3e-3 collapses
    # cross-attention (loss plateaus at the marginal target entropy ~1.54
    # and every query decodes to the same string); 1e-3 reaches exact
    # target generation by ~900 steps (loss 1.06)
    tcfg = trainer.TrainConfig(learning_rate=1e-3, warmup_steps=30, total_steps=4000)
    params, opt_state = trainer.init_train_state(cfg, tcfg, jax.random.PRNGKey(0))
    step_fn, _ = trainer.make_train_step(cfg, tcfg)
    step_fn = jax.jit(step_fn)

    pairs = []
    for t in topics:
        # trained on the CANONICAL template only; eval queries paraphrase
        src = tok.encode(" " + train_queries[t] + " || body || +")
        tgt = tok.encode_plain(f" all about {t} and the {t}")
        pairs.append((src, tgt))
    ls = max(len(s) for s, _ in pairs)
    lt = max(len(t) for _, t in pairs) + 1

    def batch_of(idxs):
        b = {
            "src_ids": np.full((len(idxs), ls), cfg.pad_token_id, np.int32),
            "src_mask": np.zeros((len(idxs), ls), np.int32),
            "tgt_in": np.full((len(idxs), lt), cfg.pad_token_id, np.int32),
            "tgt_out": np.full((len(idxs), lt), cfg.pad_token_id, np.int32),
        }
        for r, i in enumerate(idxs):
            s, t = pairs[i]
            b["src_ids"][r, : len(s)] = s
            b["src_mask"][r, : len(s)] = 1
            b["tgt_in"][r, 0] = cfg.decoder_start_token_id
            b["tgt_in"][r, 1 : len(t) + 1] = t
            b["tgt_out"][r, : len(t)] = t
        return b

    t0 = time.time()
    loss = None
    for step in range(int(os.environ.get("ACC_TRAIN_STEPS_LARGE", 1200))):
        idxs = rng.choice(len(pairs), size=16).tolist()
        params, opt_state, loss = step_fn(params, opt_state, batch_of(idxs))
    print(f"# trained in {time.time()-t0:.0f}s, loss {float(loss):.3f}",
          file=sys.stderr)

    common = dict(
        backbone="word-vocab",  # generic marker branch; BPE ' @@'/' ||' ids
        beam=6,
        length=int(os.environ.get("ACC_LARGE_LEN", 8)),  # 2 byte-BPE
        # tokens per theme word: length 6 truncates before the 2nd theme,
        # capping acc@1 at the ~34-doc sibling tie; 8 captures both
        batch_size=16,
        decode_titles=False,
        add_query_to_keys=False,
        unigram_scores=False,
        min_length=0,
        progress=False,
    )
    qlist = [queries[t] for t in topics]

    def acc_of(ranked_ids_per_query):
        acc = {1: 0, 5: 0, 20: 0}
        for t, ids in zip(topics, ranked_ids_per_query):
            for k in acc:
                acc[k] += int(gold[t] in ids[:k])
        return {k: v / n_topics for k, v in acc.items()}

    def accuracy(searcher):
        t0 = time.time()
        res = searcher.batch_search(qlist, k=20, detokenize=False)
        print(f"#   searched {len(qlist)} queries in {time.time()-t0:.0f}s",
              file=sys.stderr)
        return acc_of([[h.docid for h in hits] for hits in res])

    # ACC_LARGE_MODES=exact skips the slow modes (sharded search is ~26 min
    # on the 1-core host) for training-budget iteration; default runs all
    only_exact = os.environ.get("ACC_LARGE_MODES") == "exact"

    modes = {}
    exact = SEALSearcher(index, tok, cfg, params, **common)
    modes["exact (default)"] = accuracy(exact)

    # --- reference-ranker oracle on the SAME generated keys ---------------
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "..", "tests"))
    from test_reference_differential import ref_keys  # executed genuine source

    rk_ref = ref_keys()
    t0 = time.time()
    keysets = list(exact.batch_generate_keys(qlist))
    ranked = []
    for kk in keysets:
        res, _ = rk_ref.aggregate_evidence(
            ngrams_and_scores=[(list(n), s) for n, s in kk],
            unigram_scores=None,
            index=index,
            max_occurrences_1=exact.max_hits,
            n_docs_complete_score=exact.fully_score,
            alpha=exact.score_exponent,
            beta=exact.repetition_penalty,
            use_top_k_unigrams=exact.use_top_k_ngrams,
            smoothing=exact.smoothing,
        )
        from itertools import islice

        ranked.append([labels[i] for i in islice(res, 20)])
    modes["reference-ranker oracle"] = acc_of(ranked)
    print(f"#   oracle ranked in {time.time()-t0:.0f}s", file=sys.stderr)

    # --- free-generation ablation: does the constraint machinery earn its
    # step share?  Same model/ranker, FM-index masks off (keys may be
    # ungrounded; the count filter drops them before ranking).
    modes["free generation (ablation)"] = accuracy(
        SEALSearcher(index, tok, cfg, params, free_generation=True, **common)
    )

    if not only_exact:
        from seal_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.make_mesh(n_data=8, n_model=1, devices=jax.devices()[:8])
        sharded = SEALSearcher.build_sharded(
            docs, labels, tok, cfg, params, mesh=mesh, n_shards=8, **common
        )
        modes["sharded exact (8 shards)"] = accuracy(sharded)

        modes["compact index (wavelet)"] = accuracy(
            SEALSearcher(index, tok, cfg, params, compact_index=True, **common)
        )

    print(f"{'mode':<28} acc@1   acc@5   acc@20   "
          f"({len(index)} tokens, {n_topics} topics, vocab {tok.vocab_size})")
    for name, acc in modes.items():
        print(f"{name:<28} {acc[1]:.3f}   {acc[5]:.3f}   {acc[20]:.3f}")


def main_xl():
    """Accuracy at the 100M-token scale (round-3 verdict #4b): the regime
    where stage-1's ``max_occurrences_1``=1500 row cap and the rare/freq
    ngram split actually bind (filler unigrams occur ~10^5 times each).

    Corpus/queries are built directly in token-id space (vectorized numpy;
    no per-doc Python text encode at 100M tokens) with a fixed-vocab
    ``WordVocabTokenizer`` whose ids match, so the full text pipeline
    (query encode -> constrained decode on the accelerator -> host
    two-stage ranking) runs unmodified.  Decode runs on the default
    platform (the chip when available); ranking on host.

    Env: ACC_XL_TOKENS (default 1e8), ACC_XL_QUERIES (default 160),
    ACC_XL_TRAIN_STEPS (default 1500).
    """
    import dataclasses

    import jax

    from seal_tpu.index import FMIndex
    from seal_tpu.models.config import bart_tiny
    from seal_tpu.models.tokenizer import WordVocabTokenizer
    from seal_tpu.retrieval.searcher import SEALSearcher
    from seal_tpu.training import trainer

    rng = np.random.default_rng(0)
    n_tokens = int(float(os.environ.get("ACC_XL_TOKENS", 1e8)))
    n_queries = int(os.environ.get("ACC_XL_QUERIES", 160))

    # ---- fixed vocab, ids assigned up front -------------------------------
    # Names are LETTER-ONLY: WordVocabTokenizer splits on the GPT-2 pattern,
    # which cuts letter runs from digit runs -- "theme1" would tokenize as
    # [" theme", "1"], neither in the vocab, so every informative token in
    # queries/train sources would encode to <unk> and conditioning would be
    # impossible (the empty-hit failure this bench debugged round 4).
    def letters(i: int, width: int) -> str:
        s = ""
        for _ in range(width):
            s = chr(ord("a") + i % 26) + s
            i //= 26
        return s

    common_words = (
        " @@ || + body all about and the facts tell me please what do you"
        " know information needed find regarding Filler"
    ).split()
    n_theme = 35
    themes = [f"theme{letters(i, 2)}" for i in range(n_theme)]
    titles = [f"Theme{letters(i, 2)}" for i in range(n_theme)]
    n_filler_words = 30_000
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    for w in common_words + themes + titles:
        vocab[" " + w] = len(vocab)
    wid = {w: vocab[" " + w] for w in common_words + themes + titles}
    filler_base = len(vocab)
    for i in range(n_filler_words):
        vocab[f" word{letters(i, 4)}"] = len(vocab)
    tok = WordVocabTokenizer(vocab)
    eos = tok.eos_token_id

    def fill_ids(shape):
        """Zipf-ranked filler word ids (the stage-2 'freq ngram' mass)."""
        r = rng.zipf(1.15, size=shape)
        return (filler_base + (r % n_filler_words)).astype(np.int32)

    # ---- corpus in id space ------------------------------------------------
    pairs_ab = [(i, j) for i in range(n_theme) for j in range(i + 1, n_theme)][:595]
    gold_docs = []
    for a, b in pairs_ab:
        head = [wid[titles[a]], wid[titles[b]], wid["@@"],
                wid["all"], wid["about"], wid[themes[a]], wid[themes[b]],
                wid["and"], wid["the"], wid[themes[a]], wid[themes[b]],
                wid["facts"]]
        gold_docs.append(np.concatenate([
            np.asarray(head, np.int32), fill_ids(60), [np.int32(eos)]
        ]))
    gold_flat = np.concatenate(gold_docs)
    gold_lens = np.asarray([len(d) for d in gold_docs], np.int64)

    fill_len = 234
    n_fill = max(1, (n_tokens - int(gold_lens.sum())) // fill_len)
    fill = np.empty((n_fill, fill_len), np.int32)
    fill[:, 0] = wid["Filler"]
    fill[:, 1] = wid["@@"]
    fill[:, 2:-1] = fill_ids((n_fill, fill_len - 3))
    fill[:, -1] = eos
    # distractor partial phrases in a third of the filler docs
    mix = np.arange(0, n_fill, 3)
    xs = rng.integers(0, n_theme, size=mix.size)
    ys = rng.integers(0, n_theme, size=mix.size)
    p1 = rng.integers(2, 100, size=mix.size)
    p2 = rng.integers(110, 200, size=mix.size)
    theme_ids = np.asarray([wid[t] for t in themes], np.int32)
    for off, col in enumerate([wid["all"], wid["about"], None, wid["and"]]):
        fill[mix, p1 + off] = theme_ids[xs] if col is None else col
    for off, col in enumerate([wid["the"], None, wid["facts"]]):
        fill[mix, p2 + off] = theme_ids[ys] if col is None else col

    t0 = time.time()
    flat = np.concatenate([gold_flat, fill.ravel()])
    lens = np.concatenate([gold_lens, np.full(n_fill, fill_len, np.int64)])
    labels = [f"t{i}" for i in range(len(pairs_ab))] + [f"f{i}" for i in range(n_fill)]
    index = FMIndex()
    index.initialize_from_arrays(flat, lens, labels=labels)
    print(f"# corpus: {len(index)} tokens, {index.n_docs} docs "
          f"(build {time.time()-t0:.0f}s)", file=sys.stderr)

    # ---- tiny model trained on the canonical template ----------------------
    cfg = dataclasses.replace(
        bart_tiny(vocab_size=tok.vocab_size),
        d_model=128, encoder_layers=3, decoder_layers=3,
        encoder_attention_heads=8, decoder_attention_heads=8,
        encoder_ffn_dim=512, decoder_ffn_dim=512,
        max_position_embeddings=128,
    )
    tcfg = trainer.TrainConfig(
        learning_rate=float(os.environ.get("ACC_XL_LR", 5e-4)),
        warmup_steps=100,
        total_steps=int(os.environ.get("ACC_XL_TRAIN_STEPS", 4000)),
    )
    params, opt_state = trainer.init_train_state(cfg, tcfg, jax.random.PRNGKey(0))
    step_fn = jax.jit(trainer.make_train_step(cfg, tcfg)[0])

    topics = [f"{themes[a]} {themes[b]}" for a, b in pairs_ab]
    # Two source forms per topic: the marked decode conditioning AND the
    # plain query.  ``rescore`` teacher-forces keys under the PLAIN query
    # (searcher.py:634-638, matching the reference's rescoring input) --
    # a model that only ever saw the marked form scores theme tokens
    # ~uniformly there, sinking every informative key below zero into the
    # capped 'frequent ngram' bucket and emptying stage-1 at this corpus
    # scale.  The real SEAL checkpoint is a full LM, so plain queries are
    # in-distribution for it; the toy must be given both forms explicitly.
    train_srcs = [
        tok.encode(f" tell me about {t} please || body || +") for t in topics
    ] + [tok.encode(f" tell me about {t} please") for t in topics]
    train_tgts = [
        tok.encode_plain(f" all about {t} and the {t}") for t in topics
    ] * 2
    assert not any(
        tok.unk_token_id in s for s in train_srcs + train_tgts
    ), "train text does not round-trip the fixed vocab"
    ls = max(len(s) for s in train_srcs)
    lt = max(len(t) for t in train_tgts) + 1

    def batch_of(idxs):
        b = {
            "src_ids": np.full((len(idxs), ls), cfg.pad_token_id, np.int32),
            "src_mask": np.zeros((len(idxs), ls), np.int32),
            "tgt_in": np.full((len(idxs), lt), cfg.pad_token_id, np.int32),
            "tgt_out": np.full((len(idxs), lt), cfg.pad_token_id, np.int32),
        }
        for r, i in enumerate(idxs):
            s, t = train_srcs[i], train_tgts[i]
            b["src_ids"][r, : len(s)] = s
            b["src_mask"][r, : len(s)] = 1
            b["tgt_in"][r, 0] = cfg.decoder_start_token_id
            b["tgt_in"][r, 1 : len(t) + 1] = t
            b["tgt_out"][r, : len(t)] = t
        return b

    cache = os.environ.get("ACC_XL_CACHE")  # debug-iteration params cache
    if cache and os.path.exists(cache):
        import pickle

        with open(cache, "rb") as f:
            params = pickle.load(f)
        print(f"# loaded trained params from {cache}", file=sys.stderr)
    else:
        t0 = time.time()
        loss = None
        loss_log = []
        for step in range(tcfg.total_steps):
            params, opt_state, loss = step_fn(
                params, opt_state,
                batch_of(rng.choice(len(train_srcs), size=16).tolist()),
            )
            if step % 500 == 0:
                loss_log.append(f"{step}:{float(loss):.3f}")
        print(f"# trained in {time.time()-t0:.0f}s, loss {float(loss):.3f} "
              f"(lr {tcfg.learning_rate:g}; curve {' '.join(loss_log)})",
              file=sys.stderr)
        if cache:
            import pickle

            with open(cache, "wb") as f:
                pickle.dump(
                    jax.tree_util.tree_map(lambda v: np.asarray(v), params), f
                )

    # ---- paraphrased eval queries over a topic subset ----------------------
    eval_templates = [
        "tell me about {a} {b} please",
        "what do you know about {b} and {a}",
        "{a} {b} information needed",
        "please find facts regarding {b} {a}",
    ]
    q_idx = rng.choice(len(topics), size=min(n_queries, len(topics)), replace=False)
    qlist, q_gold = [], []
    for qi, ti in enumerate(q_idx.tolist()):
        a, b = (themes[x] for x in pairs_ab[ti])
        qlist.append(eval_templates[qi % 4].format(a=a, b=b))
        q_gold.append(f"t{ti}")

    searcher = SEALSearcher(
        index, tok, cfg, params,
        backbone="word-vocab", beam=6, length=8, batch_size=32,
        decode_titles=False, add_query_to_keys=False, unigram_scores=False,
        min_length=0, progress=False,
    )
    if os.environ.get("ACC_XL_DEBUG"):
        for q, keys in zip(qlist[:2], searcher.batch_generate_keys(qlist[:2])):
            print(f"#   keys for {q!r} ({len(keys)} total, top by score):",
                  file=sys.stderr)
            for ng, sc in sorted(keys, key=lambda x: -x[1])[:16]:
                words = "".join(tok.decoder.get(int(t), "?") for t in ng)
                print(f"#     {sc:8.2f}  n={index.get_count(list(ng)):>7} "
                      f" {words!r}", file=sys.stderr)
    t0 = time.time()
    res = searcher.batch_search(qlist, k=20, detokenize=False)
    wall = time.time() - t0
    acc = {1: 0, 5: 0, 20: 0}
    for g, hits in zip(q_gold, res):
        ids = [h.docid for h in hits]
        for k in acc:
            acc[k] += int(g in ids[:k])
    for q, g, hits in list(zip(qlist, q_gold, res))[:3]:
        print(f"#   diag: {q!r} gold={g} top5={[h.docid for h in hits[:5]]}",
              file=sys.stderr)
    n = len(qlist)
    print(f"# searched {n} queries in {wall:.0f}s ({n/wall:.2f} q/s e2e)",
          file=sys.stderr)
    print(f"xl ({len(index)} tokens, {index.n_docs} docs): "
          f"acc@1 {acc[1]/n:.3f}  acc@5 {acc[5]/n:.3f}  acc@20 {acc[20]/n:.3f}")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scale", choices=["small", "large", "xl"], default="small")
    args = ap.parse_args()
    if args.scale == "xl":
        main_xl()
    elif args.scale == "large":
        main_large()
    else:
        main()
