"""Pre-bake the bench gate's float64 oracle image (txr/ref/gate_oracle.npz).

The pure-python oracle needs ~8 minutes for the 96×54 gate frame — most of
the driver's bench budget.  bench.py loads this cache when the scene/config
hash matches and recomputes transparently otherwise, so the cache can never
mask a real change.  Re-run this (CPU, a few minutes) whenever the demo
scene or the gate config changes:

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/gen_gate_oracle.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    import bench
    from txr.apps.demo import build_scene, demo_textures
    from txr.ref.cpu_reference import render_oracle
    from txr.render.texture import with_mips
    from txr.render.trace import RenderConfig, auto_refraction_steps

    scene, _ = build_scene(bench.GATE_W, bench.GATE_H)
    textures = jax.jit(with_mips)(demo_textures())
    extra = auto_refraction_steps(scene)
    cfg = RenderConfig(width=bench.GATE_W, height=bench.GATE_H, iterations=5,
                       extra_refraction_steps=extra)
    key = bench._gate_scene_key(scene, cfg) + bench._gate_tex_key(textures)
    print(f"rendering {bench.GATE_W}x{bench.GATE_H} oracle (slow)...",
          file=sys.stderr)
    img = np.asarray(render_oracle(scene, textures, cfg), np.float64)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "txr", "ref", "gate_oracle.npz")
    np.savez_compressed(path, key=key, img=img)
    print(f"wrote {path} key={key[:16]}... img mean {img.mean():.4f}")


if __name__ == "__main__":
    main()
