"""Data-parallel generation over the virtual mesh must match single-device."""

import numpy as np
import pytest

import jax

from seal_tpu.decoding.generate import fm_index_generate, pad_batch
from seal_tpu.index import FMIndex
from seal_tpu.index.device_index import DeviceFMIndex
from seal_tpu.models import bart
from seal_tpu.models.config import bart_tiny
from seal_tpu.parallel import mesh as mesh_lib


def test_dp_generate_matches_single_device():
    rng = np.random.default_rng(5)
    docs = [rng.integers(4, 60, size=rng.integers(5, 25)).tolist() + [2] for _ in range(30)]
    host = FMIndex()
    host.initialize(docs)
    cfg = bart_tiny(vocab_size=60)
    dev = DeviceFMIndex.from_host(host, vocab=60)
    params = bart.init_params(jax.random.PRNGKey(2), cfg)
    queries = [[0] + rng.integers(4, 60, size=5).tolist() + [2] for _ in range(8)]
    ids, mask = pad_batch(queries, cfg.pad_token_id)
    kw = dict(num_beams=3, max_length=5, min_length=0, forced_bos_token_id=None,
              exact_mask=True)
    single = fm_index_generate(cfg, params, dev, ids, mask, **kw)
    mesh = mesh_lib.make_mesh()
    dp = fm_index_generate(cfg, params, dev, ids, mask, mesh=mesh, **kw)
    for a, b in zip(single, dp):
        assert {(round(s, 3), tuple(t)) for s, t in a} == {
            (round(s, 3), tuple(t)) for s, t in b
        }


def test_tp_generate_matches_single_device():
    """2x4 (data x model) mesh: inference with Megatron-sharded params must
    reproduce the replicated decode (BASELINE config 5 serving layout)."""
    rng = np.random.default_rng(6)
    docs = [rng.integers(4, 60, size=rng.integers(5, 25)).tolist() + [2] for _ in range(24)]
    host = FMIndex()
    host.initialize(docs)
    cfg = bart_tiny(vocab_size=60)
    dev = DeviceFMIndex.from_host(host, vocab=60)
    params = bart.init_params(jax.random.PRNGKey(7), cfg)
    queries = [[0] + rng.integers(4, 60, size=5).tolist() + [2] for _ in range(4)]
    ids, mask = pad_batch(queries, cfg.pad_token_id)
    kw = dict(num_beams=3, max_length=5, min_length=0, forced_bos_token_id=None,
              exact_mask=True)
    single = fm_index_generate(cfg, params, dev, ids, mask, **kw)
    mesh = mesh_lib.make_mesh(n_data=2, n_model=4)
    sharded_params = mesh_lib.shard_params(params, mesh, cfg)
    tp = fm_index_generate(cfg, sharded_params, dev, ids, mask, mesh=mesh, **kw)
    for a, b in zip(single, tp):
        assert {(round(s, 3), tuple(t)) for s, t in a} == {
            (round(s, 3), tuple(t)) for s, t in b
        }
