"""Test configuration: run JAX on CPU with a virtual 8-device mesh.

Multi-chip hardware is unavailable in CI; sharded-index and pjit paths are
exercised on virtual CPU devices (SURVEY.md section 4, item 5).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
