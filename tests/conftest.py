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
