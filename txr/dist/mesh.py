"""Device-mesh construction and multi-host init.

The reference's only parallelism is the rasteriser's implicit per-fragment
SIMT (SURVEY §2.4); TXR introduces explicit SPMD over a
``jax.sharding.Mesh``.  The natural parallel axis of a ray tracer is the ray
grid (embarrassingly parallel forward; parameter grads need one psum), so
the standard mesh is 1-2 axes over rays:

  * ``dp``: shards blocks of rays (the data-parallel axis; on a pod slice
    this is the inter-host DCN axis)
  * ``sp``: optional second axis (intra-host ICI) splitting each block

Scenes small enough to replicate (any reference-scale scene) keep the whole
primitive SoA on every chip; the contingency for giant scenes is a ring
sweep of primitive shards with a running (t, slot) argmin (SURVEY §2.4) —
see txr/dist/ring.py.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(shape=None, axis_names=("dp", "sp"), devices=None):
    """Mesh over the available devices.

    shape=None → all devices on the first axis.  shape=(a, b) must multiply
    to the device count used.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names[: arr.ndim])


def init_multihost(coordinator=None, num_processes=None, process_id=None):
    """jax.distributed bootstrap for multi-host pods.  No-op when the env
    (JAX_COORDINATOR_ADDRESS etc.) is absent and no args are given."""
    import os

    if coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_count(), jax.process_index()
