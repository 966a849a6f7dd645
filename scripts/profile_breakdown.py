"""Per-component breakdown of the 1080p forward frame (VERDICT r2 item 1).

Ablation timing: each variant renders the same demo frame with one feature
removed (or only one subsystem kept), K-frame chained inside one jit and
scalar-fenced exactly like bench.py, so tunnel latency and async dispatch
cannot lie.  The difference between variants bounds each subsystem's cost.

Also prints the live-ray distribution per scan step (how many of the 13
steps actually do work), which prices the static refraction budget.

Run on the TPU:  python scripts/profile_breakdown.py
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
    assert np.isfinite(v), "non-finite chain output"
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - CALL_LATENCY_S, 1e-9) / k


def main():
    import os

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("TXR_COMPILE_CACHE", "/root/.cache/jax_comp"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from txr.apps.demo import build_scene, demo_textures
    from txr.render.trace import RenderConfig, trace
    from txr.render.render import render
    from txr.render.raygen import primary_rays
    from txr.render.texture import with_mips, TextureSet
    from txr.kernels.pallas_intersect import nearest_hit_pallas, shadow_sweep_pallas

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    W, H = (1920, 1080) if on_tpu else (192, 108)
    K = 4 if on_tpu else 2
    scene, _ = build_scene(W, H)
    textures = demo_textures()
    base = RenderConfig(width=W, height=H, iterations=5,
                        ray_chunk=(1 << 16) if on_tpu else 0)
    n_rays = W * H

    def frame_chain(cfg, textures=textures):
        def chain():
            acc = jnp.float32(0.0)
            for _ in range(K):
                s = dataclasses.replace(
                    scene, camera=dataclasses.replace(
                        scene.camera, pos=scene.camera.pos + acc * 1e-30))
                acc = acc + jnp.sum(render(s, textures, cfg))
            return acc
        return jax.jit(chain)

    results = {}

    def report(name, t):
        results[name] = t * 1e3
        print(f"{name:40s} {t*1e3:9.1f} ms/frame  ({n_rays/t/1e6:7.2f} Mrays/s)",
              file=sys.stderr)

    # -- live-ray distribution per step (prices the step budget) -----------
    from txr.render.trace import initial_state, make_step

    def instrumented(scene):
        tx_m = with_mips(textures)
        ro, rd = primary_rays(scene.camera, W, H, 1)
        cfg = dataclasses.replace(base, ray_chunk=0, gating=False)
        state = initial_state(ro, rd)
        body = make_step(scene, tx_m, cfg)
        counts = []
        for _ in range(cfg.max_steps):
            counts.append(jnp.sum(state["alive"]))
            state = body(state)
        return jnp.stack(counts)

    try:
        cs = np.asarray(jax.jit(instrumented)(scene))
        print("# live rays per step: " +
              " ".join(f"{int(c)}" for c in cs), file=sys.stderr)
        print("# live frac per step: " +
              " ".join(f"{c/n_rays:.4f}" for c in cs), file=sys.stderr)
        results["live_frac"] = [float(c) / n_rays for c in cs]
    except Exception as e:
        print(f"# live-step instrumentation failed: {e}", file=sys.stderr)

    # -- component ablations ------------------------------------------------
    report("full forward (r2 config)", timed(frame_chain(base), K))
    report("gating off", timed(frame_chain(
        dataclasses.replace(base, gating=False)), K))
    report("no chunking (whole frame)", timed(frame_chain(
        dataclasses.replace(base, ray_chunk=0)), K))
    report("shadows off", timed(frame_chain(
        dataclasses.replace(base, shadow_enabled=False)), K))
    report("glossy off", timed(frame_chain(
        dataclasses.replace(base, refractive_glossy=False)), K))
    report("texture LOD off", timed(frame_chain(
        dataclasses.replace(base, texture_lod=False)), K))
    report("no textures at all", timed(frame_chain(base, TextureSet()), K))
    for extra in (0, 2, 4):
        report(f"extra_refraction_steps={extra}", timed(frame_chain(
            dataclasses.replace(base, extra_refraction_steps=extra)), K))
    report("iterations=1 extra=0", timed(frame_chain(
        dataclasses.replace(base, iterations=1, extra_refraction_steps=0)), K))

    # -- raw sweeps ----------------------------------------------------------
    ro, rd = jax.jit(lambda s: primary_rays(s.camera, W, H, 1))(scene)
    ro = jax.block_until_ready(ro)

    def sweep_chain(n_steps):
        def chain():
            acc = jnp.float32(0.0)
            o, d = ro, rd
            for _ in range(n_steps):
                t, slot = nearest_hit_pallas(scene, o + acc * 1e-30, d)
                acc = acc + jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)) * 1e-30
            return acc
        return jax.jit(chain)

    t13 = timed(sweep_chain(13), 1)
    report("13x nearest-hit pallas sweep only", t13)
    t1 = timed(sweep_chain(1), 1)
    report("1x nearest-hit pallas sweep only", t1)

    def shadow_chain(n_steps):
        dist = jnp.full((n_rays * 2,), 1e4, jnp.float32)
        ro2 = jnp.concatenate([ro, ro])
        rd2 = jnp.concatenate([rd, rd])
        def chain():
            acc = jnp.float32(0.0)
            for _ in range(n_steps):
                solid, rh, ruv = shadow_sweep_pallas(
                    scene, ro2 + acc * 1e-30, rd2, dist)
                acc = acc + jnp.sum(solid) * 1e-30
            return acc
        return jax.jit(chain)

    report("5x shadow sweep (2 lights) only", timed(shadow_chain(5), 1))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
