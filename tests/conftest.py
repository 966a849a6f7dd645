"""Test environment: CPU backend with 8 virtual devices.

Must run before any jax import: the axon TPU tunnel is per-op slow (only fit
for whole-jit benchmarks) and sitecustomize force-registers it unless the
pool IP is cleared.  The 8-device CPU mesh is the SURVEY §4.4 stand-in for
multi-chip sharding tests.
"""

import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
