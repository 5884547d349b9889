"""Two-process DCN worker for tests/test_multihost.py.

Invoked as: python multihost_worker.py <port> <process_id> <out_json>
Each process owns 4 virtual CPU devices; together they form an 8-device
global mesh.  Builds the shared deterministic world, contributes its
``process_slice`` of the global 8-query batch via ``host_batch_to_global``,
runs ONE data-sharded ``fm_index_generate``, and writes the hypotheses for
its local queries (which ``_fetch_local`` reassembles from the process's
addressable output shards).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_world():
    import numpy as np

    import jax

    from seal_tpu.index import FMIndex
    from seal_tpu.index.device_index import DeviceFMIndex
    from seal_tpu.models import bart
    from seal_tpu.models.config import bart_tiny

    rng = np.random.default_rng(5)
    docs = [
        rng.integers(4, 60, size=int(rng.integers(5, 20))).tolist() + [2]
        for _ in range(30)
    ]
    host = FMIndex()
    host.initialize(docs)
    dev = DeviceFMIndex.from_host(host, vocab=64)
    cfg = bart_tiny(vocab_size=64)
    params = bart.init_params(jax.random.PRNGKey(1), cfg)
    queries = [[0] + rng.integers(4, 60, size=5).tolist() + [2] for _ in range(8)]
    return host, dev, cfg, params, queries


GEN_KW = dict(num_beams=3, max_length=5, min_length=0, forced_bos_token_id=None)


def main():
    port, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    from seal_tpu.decoding.generate import fm_index_generate, pad_batch
    from seal_tpu.parallel import multihost

    host, dev, cfg, params, queries = build_world()
    mesh = multihost.global_mesh()
    ids, mask = pad_batch(queries, cfg.pad_token_id)
    start, end = multihost.process_slice(len(queries))
    gids, gmask = multihost.host_batch_to_global(mesh, ids[start:end], mask[start:end])
    out = fm_index_generate(cfg, params, dev, gids, gmask, mesh=mesh, **GEN_KW)
    assert len(out) == end - start, (len(out), start, end)
    payload = {
        "start": start,
        "end": end,
        "hyps": [
            [[round(float(s), 3), list(map(int, t))] for s, t in q] for q in out
        ],
    }
    with open(out_path, "w") as f:
        json.dump(payload, f)


if __name__ == "__main__":
    main()
