"""TXR benchmark: 1080p forward+backward rays/s on the full demo scene.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The reference publishes no numbers (BASELINE.md); the derived parity point
is 1280x720 @ 60 FPS ≈ 5.5e7 forward primary rays/s — what "real-time"
meant for the reference demo.  vs_baseline = forward rays/s / 5.5e7.

Runs on whatever jax.devices() provides (the real TPU chip under the
driver; CPU with the env overrides in tests/conftest.py).
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np

BASELINE_FWD_RAYS_PER_S = 5.5e7  # BASELINE.md derived reference-parity point


def _bench(fn, *args, warmup=1, iters=3):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    import jax
    import jax.numpy as jnp

    from txr.apps.demo import build_scene, demo_textures
    from txr.render.trace import RenderConfig
    from txr.render.render import render

    W, H = 1920, 1080
    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    warmup, iters = (2, 5) if on_tpu else (1, 2)
    if not on_tpu:
        W, H = 192, 108  # keep CPU smoke runs tractable

    scene, _ = build_scene(W, H)
    textures = demo_textures()
    cfg = RenderConfig(width=W, height=H, iterations=5,
                       ray_chunk=(1 << 18) if on_tpu else 0)
    n_rays = W * H

    fwd = jax.jit(lambda s, t: render(s, t, cfg))
    t_fwd = _bench(fwd, scene, textures, warmup=warmup, iters=iters)
    fwd_rays = n_rays / t_fwd
    print(f"# forward: {t_fwd*1e3:.1f} ms/frame = {fwd_rays:,.0f} rays/s"
          f" ({1/t_fwd:.1f} FPS at {W}x{H})", file=sys.stderr)

    target = fwd(scene, textures)

    bwd_cfg = dataclasses.replace(cfg, ray_chunk=(1 << 17) if on_tpu else 0)

    def loss(s, t):
        return jnp.mean((render(s, t, bwd_cfg) - target) ** 2)

    fwdbwd = jax.jit(jax.grad(loss, allow_int=True))
    try:
        t_fb = _bench(fwdbwd, scene, textures, warmup=warmup, iters=iters)
        fb_rays = n_rays / t_fb
        fb_fields = {"value": round(fb_rays), "fwd_bwd_ms": round(t_fb * 1e3, 2)}
    except Exception as e:  # report forward even if backward faults
        print(f"# backward failed: {type(e).__name__}: {e}", file=sys.stderr)
        fb_fields = {"value": round(fwd_rays), "fwd_bwd_ms": None,
                     "note": "backward faulted; value = forward rays/s"}

    result = {
        "metric": "1080p forward+backward rays/s/chip (full demo scene)",
        "unit": "rays/s",
        "vs_baseline": round(fwd_rays / BASELINE_FWD_RAYS_PER_S, 4),
        "forward_rays_per_s": round(fwd_rays),
        "forward_ms_per_frame": round(t_fwd * 1e3, 2),
        "forward_fps": round(1.0 / t_fwd, 2),
        "resolution": f"{W}x{H}",
        "device": str(dev),
    }
    result.update(fb_fields)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
