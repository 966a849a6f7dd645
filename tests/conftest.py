"""Test environment: CPU backend with 8 virtual devices.

The axon sitecustomize imports jax and registers the (per-op slow) TPU
tunnel at interpreter startup — before conftest runs — so plain env vars are
too late here.  ``jax.config.update`` still works because backends
initialise lazily, and XLA_FLAGS is read at first backend init.  The
8-device CPU mesh is the SURVEY §4.4 stand-in for multi-chip sharding
tests.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeat test runs skip recompiles entirely
jax.config.update("jax_compilation_cache_dir", "/tmp/txr_jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
