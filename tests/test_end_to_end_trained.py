"""The full SEAL loop: train a tiny model on supervised (query -> span)
pairs with our trainer, then retrieve with generation-driven keys only
(no query decomposition) -- the trained LM must generate grounded keys that
rank the right document first.
"""

import numpy as np
import pytest

import jax

from seal_tpu.index import FMIndex
from seal_tpu.models import bart
from seal_tpu.models.config import bart_tiny
from seal_tpu.models.tokenizer import WordVocabTokenizer
from seal_tpu.retrieval.searcher import SEALSearcher
from seal_tpu.training import trainer

N_TOPICS = 12


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(0)
    filler = [f"w{i}" for i in range(50)]
    topics = [f"topic{i}" for i in range(N_TOPICS)]
    bodies = {
        t: f"all about {t} and the {t} facts " + " ".join(rng.choice(filler, size=12))
        for t in topics
    }
    texts = [f"{t.capitalize()} @@ {bodies[t]}" for t in topics]
    queries = {t: f"tell me about {t} please" for t in topics}

    tok = WordVocabTokenizer.train(
        [" " + x for x in texts] + [" " + q + " || body || +" for q in queries.values()]
    )
    docs = [tok.encode_plain(" " + x) + [tok.eos_token_id] for x in texts]
    index = FMIndex()
    index.initialize(docs, labels=topics)

    cfg = bart_tiny(vocab_size=tok.vocab_size)
    tcfg = trainer.TrainConfig(learning_rate=3e-3, warmup_steps=10, total_steps=4000)
    params, opt_state = trainer.init_train_state(cfg, tcfg, jax.random.PRNGKey(0))
    step_fn, _ = trainer.make_train_step(cfg, tcfg)
    step_fn = jax.jit(step_fn)

    # training pairs mirror the searcher's conditioning: marked query -> span
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

    loss = None
    for step in range(400):
        idxs = rng.choice(len(pairs), size=8).tolist()
        params, opt_state, loss = step_fn(params, opt_state, batch_of(idxs))
    # label smoothing (eps=0.1) leaves an irreducible floor around ~0.9
    assert float(loss) < 1.5, f"training failed to converge: {float(loss)}"

    searcher = SEALSearcher(
        index, tok, cfg, params,
        backbone="word-vocab", beam=4, length=6, batch_size=4,
        exact_mask=True, decode_titles=False, add_query_to_keys=False,
        unigram_scores=False, min_length=0,
    )
    return searcher, topics, queries


def test_trained_model_generates_grounded_keys(world):
    searcher, topics, queries = world
    keys = searcher.generate_keys(queries["topic3"])
    assert keys, "trained model produced no grounded keys"
    for ngram, score in keys:
        assert searcher.fm_index.get_count(list(ngram)) > 0


def test_trained_model_retrieves_right_docs(world):
    searcher, topics, queries = world
    test_topics = ["topic1", "topic4", "topic7", "topic9"]
    results = searcher.batch_search([queries[t] for t in test_topics], k=3)
    hits = sum(1 for t, docs in zip(test_topics, results) if docs and docs[0].docid == t)
    assert hits >= 3, [
        (t, [d.docid for d in docs]) for t, docs in zip(test_topics, results)
    ]
