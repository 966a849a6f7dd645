"""Final r3 layout sweep: step-level block compaction x chunk size."""

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

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("TXR_COMPILE_CACHE", "/root/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from txr.apps.demo import build_scene, demo_textures
    from txr.render.trace import RenderConfig
    from txr.render.render import render

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    W, H = (1920, 1080) if on_tpu else (192, 108)
    K = 2
    scene, _ = build_scene(W, H)
    textures = demo_textures()
    n_rays = W * H
    base = RenderConfig(width=W, height=H, iterations=5,
                        extra_refraction_steps=4)
    results = {}

    def frame_chain(cfg):
        @jax.jit
        def chain():
            acc = jnp.float32(0.0)
            for _ in range(K):
                s = dataclasses.replace(
                    scene, camera=dataclasses.replace(
                        scene.camera, pos=scene.camera.pos + acc * 1e-30))
                acc = acc + jnp.sum(render(s, textures, cfg))
            return acc
        return chain

    def report(name, cfg):
        try:
            t = timed(frame_chain(cfg), K)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
            results[name] = None
            return
        results[name] = round(t * 1e3, 2)
        print(f"{name:46s} {t*1e3:9.1f} ms  ({n_rays/t/1e6:7.2f} Mrays/s)",
              file=sys.stderr)

    report("stepcompact wholeframe extra=4",
           dataclasses.replace(base, ray_chunk=0))
    report("stepcompact chunk=512K extra=4",
           dataclasses.replace(base, ray_chunk=1 << 19))
    report("stepcompact chunk=256K extra=4",
           dataclasses.replace(base, ray_chunk=1 << 18))
    report("chunk=64K extra=4 (no stepcompact)",
           dataclasses.replace(base, ray_chunk=1 << 16))
    report("stepcompact wholeframe extra=2",
           dataclasses.replace(base, ray_chunk=0, extra_refraction_steps=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
