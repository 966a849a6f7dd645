"""Decompose the fused 1080p frame: probe kernel alone, no-texture render,
compaction on/off — finds which stage eats the frame."""

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
    from txr.render.raygen import primary_rays
    from txr.render.texture import TextureSet, with_mips
    from txr.render import fused
    from txr.kernels.pallas_step import step_probe_pallas

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    W, H = (1920, 1080) if on_tpu else (192, 108)
    K = 2
    scene, _ = build_scene(W, H)
    textures = demo_textures()
    n_rays = W * H
    base = RenderConfig(width=W, height=H, iterations=5,
                        extra_refraction_steps=4, ray_chunk=0)
    results = {}

    def report(name, t):
        results[name] = round(t * 1e3, 2)
        print(f"{name:46s} {t*1e3:9.1f} ms  ({n_rays/t/1e6:7.2f} Mrays/s)",
              file=sys.stderr)

    # 1. probe kernel alone, 7 chained calls (the live-step count)
    ro, rd = jax.jit(lambda s: primary_rays(s.camera, W, H, 1))(scene)
    ro = jax.block_until_ready(ro)
    tx_m = None

    def probe_chain(n):
        @jax.jit
        def chain():
            acc = jnp.float32(0.0)
            o = ro
            for _ in range(n):
                pr = step_probe_pallas(scene, None, o, rd,
                                       pix_angle=1.0 / H)
                acc = acc + jnp.sum(pr["t"] * jnp.isfinite(pr["t"])) * 1e-30
                o = o + acc * 1e-30
            return acc
        return chain

    report("7x probe kernel (no atlas)", timed(probe_chain(7), 1))
    report("1x probe kernel (no atlas)", timed(probe_chain(1), 1))

    def frame_chain(cfg, tex):
        @jax.jit
        def chain():
            acc = jnp.float32(0.0)
            for _ in range(K):
                s = dataclasses.replace(
                    scene, camera=dataclasses.replace(
                        scene.camera, pos=scene.camera.pos + acc * 1e-30))
                acc = acc + jnp.sum(render(s, tex, cfg))
            return acc
        return chain

    # 2. full fused render without any textures (no fetch at all)
    report("fused frame, no textures", timed(frame_chain(base, TextureSet()), K))

    # 3. fused frame, textures, compaction OFF (full-width fetches)
    fused._COMPACT_MIN_R = 1 << 30
    report("fused frame, tex, compaction OFF",
           timed(frame_chain(base, textures), K))

    # 4. fused frame, textures, compaction ON (frame_chain builds a fresh
    # jit closure each call, so the global is re-read at trace time)
    fused._COMPACT_MIN_R = 4096
    report("fused frame, tex, compaction ON",
           timed(frame_chain(base, textures), K))

    # 5. chunked 64K with compaction
    cfg5 = dataclasses.replace(base, ray_chunk=1 << 16)
    report("fused frame, tex, chunk=64K, compact ON",
           timed(frame_chain(cfg5, textures), K))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
