"""Test configuration: run JAX on CPU with a virtual 8-device mesh.

Multi-chip hardware is unavailable in CI; sharded-index and pjit paths are
exercised on virtual CPU devices (SURVEY.md section 4, item 5).
"""

import os

# Force CPU: the ambient environment presets JAX_PLATFORMS=axon (the real
# TPU behind a network tunnel; per-op dispatch there is ~6ms) and the axon
# sitecustomize imports jax at interpreter startup, so the env var is already
# baked into jax.config -- it must be overridden via config.update.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    A full single-process suite run accumulates hundreds of compiled
    programs; at ~83% through (while compiling the shard_map decode of
    test_sharded_searcher) XLA segfaulted inside backend_compile in two
    consecutive uncapped runs (round-3 verdict item).  Per-module pruning
    keeps the compile-state footprint bounded; standalone module behavior
    is unchanged (each module recompiles what it needs anyway).
    """
    yield
    jax.clear_caches()
    # the generation layer memoizes jitted closures keyed by configs; those
    # hold executables alive past clear_caches, so drop them too
    try:
        from seal_tpu.decoding import generate

        generate._jitted_search.cache_clear()
    except Exception:
        pass
    try:
        from seal_tpu.parallel import sharded_decode

        sharded_decode._jitted_sharded_search.cache_clear()
    except Exception:
        pass
    try:
        from seal_tpu.scoring import keys as _keys

        _keys._jitted_rescore.cache_clear()
        _keys._jitted_unigram.cache_clear()
        _keys._jitted_encode.cache_clear()
    except Exception:
        pass
    import gc

    gc.collect()
