"""Multi-process ("multi-host") distributed test — SURVEY §4 item 4.

Spawns 2 local processes that form one jax.distributed world (4 virtual CPU
devices each, global mesh of 8) and exercises init_multihost + the global
sharded render/grad path: host-local→global array construction, shard_map
over a cross-process mesh, psum over DCN-equivalent transport.  Results
must agree across processes and with a plain single-process render.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _parse(out):
    cs = grad = None
    for line in out.splitlines():
        if line.startswith("CHECKSUM"):
            cs = float(line.split()[1])
        if line.startswith("GRAD"):
            grad = [float(x) for x in line.split()[1:]]
    return cs, grad


def test_two_process_mesh_render_and_grad():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    repo_root = os.path.dirname(os.path.dirname(worker))
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        PYTHONPATH=repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, f"127.0.0.1:{port}", "2", str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
            cwd=os.path.dirname(os.path.dirname(worker)),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        if p.returncode != 0:
            if "distributed" in err.lower() and "support" in err.lower():
                pytest.skip(f"multi-process CPU backend unsupported: {err[-200:]}")
            raise AssertionError(f"worker failed rc={p.returncode}:\n{err[-2000:]}")
        outs.append(out)

    cs0, g0 = _parse(outs[0])
    cs1, g1 = _parse(outs[1])
    assert cs0 is not None and g0 is not None, outs[0]
    # both processes see the identical replicated results
    np.testing.assert_allclose(cs0, cs1, rtol=1e-6)
    np.testing.assert_allclose(g0, g1, rtol=1e-6)

    # single-process reference (this process, plain CPU)
    from txr.scene.factories import SceneBuilder
    from txr.render.texture import TextureSet, checkerboard
    from txr.render.trace import RenderConfig
    from txr.render.render import render_jit
    import jax
    import jax.numpy as jnp

    b = SceneBuilder(camera_pos=(0, 0, -5))
    b.ambient_color = (0.025,) * 3
    b.shadow_ambient = (0.1,) * 3
    b.add_light_point((3, 5, 0), (1, 1, 1), 25.5)
    b.add_sphere((0.5, 0, 6), 1.0, b.material((0, 0, 1), specular=50, reflect=0.35))
    b.add_sphere((-2, 0, 6), 1.0, b.material((1, 1, 1)), texture=1)
    b.add_box((0, -1.2, 6), (10, 0.2, 5), b.material((1, 0.6, 0), specular=100))
    scene = b.build()
    tex = TextureSet(sphere=(checkerboard(32, 32),))
    cfg = RenderConfig(width=40, height=24, refractive_glossy=False)
    img = render_jit(scene, tex, cfg)
    np.testing.assert_allclose(cs0, float(jnp.sum(img)), rtol=1e-4)
