"""render_sharded on a 1-device TPU mesh vs plain render (VERDICT r3 item 3).

Quantifies what a pod would lose per chip from the shard_map wrapper now
that the Pallas fast path (sweep + fused step) runs inside shard_map on
real devices.  Acceptance: sharded per-chip throughput within 10% of
unsharded.  Also cross-checks the sharded image against the unsharded one.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CALL_LATENCY_S = 0.024


def timed(fn, k, iters=2):
    v = float(np.asarray(fn()))
    assert np.isfinite(v)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - CALL_LATENCY_S, 1e-9) / k


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("TXR_COMPILE_CACHE", "/root/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from txr.apps.demo import build_scene, demo_textures
    from txr.render.trace import RenderConfig
    from txr.render.render import render
    from txr.dist.sharded import render_sharded

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    W, H = (1920, 1080) if on_tpu else (192, 108)
    K = 2
    scene, _ = build_scene(W, H)
    textures = demo_textures()
    n_rays = W * H
    # NOTE: ray_chunk=0 for the sharded comparison — the chunked lax.map and
    # shard_map measure different programs; compare like for like
    cfg = RenderConfig(width=W, height=H, iterations=5,
                       extra_refraction_steps=6, ray_chunk=0)
    mesh = Mesh(np.array(jax.devices()[:1]), ("dp",))

    def chain(render_fn):
        def go():
            acc = jnp.float32(0.0)
            for _ in range(K):
                s = dataclasses.replace(
                    scene, camera=dataclasses.replace(
                        scene.camera, pos=scene.camera.pos + acc * 1e-30))
                acc = acc + jnp.sum(render_fn(s))
            return acc
        return jax.jit(go)

    # correctness: sharded == unsharded (identical program per device)
    img0 = np.asarray(jax.jit(
        lambda s: render(s, textures, cfg))(scene))
    img1 = np.asarray(jax.jit(
        lambda s: render_sharded(s, textures, cfg, mesh))(scene))
    max_diff = float(np.abs(img0 - img1).max())
    print(f"# sharded vs unsharded max pixel diff: {max_diff:.2e}",
          file=sys.stderr)

    t_plain = timed(chain(lambda s: render(s, textures, cfg)), K)
    t_shard = timed(chain(lambda s: render_sharded(s, textures, cfg, mesh)), K)
    out = {
        "plain_ms": round(t_plain * 1e3, 2),
        "sharded_ms": round(t_shard * 1e3, 2),
        "plain_mrays": round(n_rays / t_plain / 1e6, 2),
        "sharded_mrays": round(n_rays / t_shard / 1e6, 2),
        "sharded_over_plain": round(t_shard / t_plain, 4),
        "max_pixel_diff": max_diff,
        "device": str(dev),
    }
    print(f"# plain {t_plain*1e3:.1f} ms vs sharded {t_shard*1e3:.1f} ms "
          f"({out['sharded_over_plain']:.2f}x)", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
