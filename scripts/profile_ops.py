"""Per-op device-time attribution for one 1080p frame via jax.profiler
xplane capture (the op-level view the ablation timers can't give through
the tunnel's ±5 ms noise).  Parses the xplane proto with the installed
tensorboard_plugin_profile/xprof protobufs and prints the top ops.
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_xplane(path):
    import glob as _g
    import importlib.util

    cands = _g.glob(
        "/opt/venv/lib/python*/site-packages/tensorflow/tsl/profiler/"
        "protobuf/xplane_pb2.py")
    spec = importlib.util.spec_from_file_location("xplane_pb2", cands[0])
    xplane_pb2 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(xplane_pb2)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def aggregate(xs):
    rows = []
    for plane in xs.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        agg = defaultdict(lambda: [0.0, 0])
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                agg[name][0] += ev.duration_ps / 1e9   # ms
                agg[name][1] += 1
        rows.append((plane.name, agg))
    return rows


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("TXR_COMPILE_CACHE", "/root/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from txr.apps.demo import build_scene, demo_textures
    from txr.render.trace import RenderConfig
    from txr.render.render import render

    W, H = 1920, 1080
    scene, _ = build_scene(W, H)
    from txr.render.texture import with_mips

    textures = jax.jit(with_mips)(demo_textures())
    cfg = RenderConfig(width=W, height=H, iterations=5,
                       extra_refraction_steps=6, ray_chunk=1 << 19)

    if os.environ.get("TXR_PROFILE_MODE") == "bwd":
        # replicate bench.py's fb_chain EXACTLY (same jit program → warm
        # compile cache, and the chain variant is the one that fits HBM)
        import dataclasses

        cfg_fb = dataclasses.replace(cfg, ray_chunk=1 << 18)

        def loss(s, textures):
            return jnp.mean(render(s, textures, cfg_fb) ** 2)

        grad_fn = jax.grad(loss, allow_int=True)

        @jax.jit
        def chain(scene, textures):
            acc = jnp.float32(0.0)
            for _ in range(1):
                s = dataclasses.replace(
                    scene, camera=dataclasses.replace(
                        scene.camera, pos=scene.camera.pos + acc * 1e-30))
                g = grad_fn(s, textures)
                acc = acc + jnp.sum(g.camera.pos) + jnp.sum(g.spheres.pos)
            return acc

        f = chain
    else:
        f = jax.jit(lambda s, t: jnp.sum(render(s, t, cfg)))
    print("warmup...", file=sys.stderr)
    np.asarray(f(scene, textures))

    logdir = "/tmp/txr_xplane"
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        np.asarray(f(scene, textures))

    pbs = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    pbs.sort(key=os.path.getmtime)
    assert pbs, "no xplane capture written"
    xs = load_xplane(pbs[-1])
    for plane, agg in aggregate(xs):
        total = sum(v[0] for v in agg.values())
        print(f"\n== plane {plane}: {total:.1f} ms total")
        items = sorted(agg.items(), key=lambda kv: -kv[1][0])[:40]
        for name, (ms, n) in items:
            print(f"  {ms:9.2f} ms  x{n:5d}  {name[:110]}")


if __name__ == "__main__":
    main()
