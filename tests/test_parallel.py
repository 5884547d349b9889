"""Mesh / sharded-index / sharded-trainer tests on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seal_tpu.index import FMIndex
from seal_tpu.models import bart
from seal_tpu.models.config import bart_tiny
from seal_tpu.parallel import mesh as mesh_lib
from seal_tpu.parallel.sharded_index import (
    ShardedFMIndex,
    sharded_allowed_mask,
    sharded_count_sequences,
)
from seal_tpu.training import trainer


@pytest.fixture(scope="module")
def docs():
    rng = np.random.default_rng(11)
    return [
        rng.integers(4, 40, size=rng.integers(5, 30)).tolist() + [2] for _ in range(41)
    ]


def test_make_mesh_shapes():
    mesh = mesh_lib.make_mesh(n_model=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")
    mesh = mesh_lib.make_mesh()
    assert mesh.devices.shape == (8, 1)


def test_sharded_counts_match_global(docs):
    mesh = mesh_lib.make_mesh()
    full = FMIndex()
    full.initialize(docs)
    si, hosts, assign = ShardedFMIndex.build(docs, n_shards=8, vocab=45)
    si = si.place(mesh)

    rng = np.random.default_rng(0)
    pats = [rng.integers(0, 42, size=rng.integers(1, 4)).tolist() for _ in range(30)]
    L = max(len(p) for p in pats)
    toks = np.zeros((len(pats), L), np.int32)
    lens = np.array([len(p) for p in pats], np.int32)
    for i, p in enumerate(pats):
        toks[i, : len(p)] = p

    got = np.asarray(sharded_count_sequences(si, mesh, toks, lens))
    # NOTE: the monolithic index counts patterns spanning doc boundaries;
    # shards have different boundaries, so compare against the sum of
    # per-shard host counts (the sharded semantics)
    expect = np.array(
        [sum(h.get_count(p) for h in hosts) for p in pats], dtype=np.int64
    )
    np.testing.assert_array_equal(got, expect)
    # and within-document patterns agree with the monolithic index
    for i, p in enumerate(pats):
        if len(p) == 1:
            assert got[i] == full.get_count(p)


def test_sharded_allowed_mask(docs):
    mesh = mesh_lib.make_mesh()
    si, hosts, assign = ShardedFMIndex.build(docs, n_shards=8, vocab=45)
    si = si.place(mesh)
    prefix = [docs[0][0]]
    toks = np.array([prefix], np.int32)
    lens = np.array([1], np.int32)
    cands = np.arange(45, dtype=np.int32)[None, :]
    got = np.asarray(sharded_allowed_mask(si, mesh, toks, lens, cands))[0]
    expect = np.array(
        [sum(h.get_count(prefix + [int(c)]) for h in hosts) for c in range(45)]
    )
    np.testing.assert_array_equal(got, expect)


def test_shard_view_roundtrip(docs):
    si, hosts, assign = ShardedFMIndex.build(
        docs, n_shards=4, vocab=45, labels=[f"d{i}" for i in range(len(docs))]
    )
    for s in range(4):
        view = si.shard_view(s)
        assert int(view.n_rows) == hosts[s].size()
    assert hosts[0].labels == [f"d{i}" for i in assign[0]]


def test_sharded_train_step_runs():
    mesh = mesh_lib.make_mesh(n_model=2)
    cfg = bart_tiny(vocab_size=64)
    tcfg = trainer.TrainConfig(learning_rate=1e-2, warmup_steps=0, total_steps=1000)
    params, opt_state = trainer.init_train_state(cfg, tcfg)
    params = mesh_lib.shard_params(params, mesh, cfg)
    step, _ = trainer.make_sharded_train_step(cfg, tcfg, mesh)

    rng = np.random.default_rng(0)
    batch = {
        "src_ids": rng.integers(4, 64, size=(8, 12)).astype(np.int32),
        "src_mask": np.ones((8, 12), np.int32),
        "tgt_in": rng.integers(4, 64, size=(8, 6)).astype(np.int32),
        "tgt_out": rng.integers(4, 64, size=(8, 6)).astype(np.int32),
    }
    p1, o1, loss1 = step(params, opt_state, batch)
    p2, o2, loss2 = step(p1, o1, batch)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert float(loss2) < float(loss1)  # it learns the (fixed) batch


def test_label_smoothed_nll():
    logits = jnp.zeros((1, 3, 5))
    targets = jnp.array([[1, 2, 0]])  # last is pad (pad_id=0 here)
    loss, ntok = trainer.label_smoothed_nll(logits, targets, pad_id=0, eps=0.1)
    # uniform logits: nll = log(5) for every token, smoothing adds the same
    assert float(ntok) == 2.0
    np.testing.assert_allclose(float(loss), np.log(5.0), rtol=1e-6)
