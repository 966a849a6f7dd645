"""Per-step cost vs batch width: separates the FIXED per-instance overhead
(cond gates, compaction machinery, launch latency) from row-proportional
work, for the fused bounce step with all fetch classes on/off.

If cost flattens as width shrinks, the frame is instance-count-bound and
the lever is fewer (chunk, step) instances — not faster gathers.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 8
CALL_LATENCY_S = 0.024


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("TXR_COMPILE_CACHE", "/root/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from txr.apps.demo import build_scene, demo_textures
    from txr.render.trace import RenderConfig, initial_state, make_step
    from txr.render.raygen import primary_rays
    from txr.render.texture import with_mips
    from txr.render.render import _tile_order, TILE_H, TILE_W

    W, H = 1920, 1080
    scene, _ = build_scene(W, H)
    textures = jax.jit(with_mips)(demo_textures())
    cfg = RenderConfig(width=W, height=H, iterations=5,
                       extra_refraction_steps=6)

    ro, rd = primary_rays(scene.camera, W, H, 1)
    ro = _tile_order(ro, H, W)
    rd = _tile_order(rd, H, W)

    res = {}

    def timed(name, fn, *args):
        g = jax.jit(fn)
        v = np.asarray(g(*args))
        assert np.isfinite(v).all()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(g(*args))
            ts.append(time.perf_counter() - t0)
        ms = (min(ts) - CALL_LATENCY_S) / K * 1e3
        res[name] = round(ms, 3)
        print(f"{name:44s} {ms:8.2f} ms/step", file=sys.stderr)

    for width in (1 << 19, 1 << 17, 1 << 15, 1 << 13):
        roc, rdc = ro[:width], rd[:width]

        # scene/textures as ARGS, not closure constants — constants bake
        # into the program body and blow the tunnel's remote-compile limit
        def steps(scene, textures, roc, rdc):
            st = initial_state(roc, rdc)
            body = make_step(scene, textures, cfg)

            def f(st, _):
                st = body(st)
                # keep every ray alive so each rep does full-width work
                st = dict(st, alive=jnp.ones_like(st["alive"]),
                          bounces=jnp.zeros_like(st["bounces"]))
                return st, None

            st, _ = jax.lax.scan(f, st, None, length=K)
            return st["color"]

        timed(f"step all-on  w={width}", steps, scene, textures, roc, rdc)

    # fetch classes off (TXR_ABL_* set by the wrapper run)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
