"""Edge-AA at 1080p: budget-sufficiency + PSNR evidence (VERDICT r4 item 7).

The edge-adaptive AA re-renders only luma-edge pixels, under a static
budget of ``edge_budget_mult·(H+W)`` pixels (trace.RenderConfig).  Small
test frames always fit; the adversarial case is the full demo scene at
1080p (planet silhouettes + the ring).  This script renders that case and
records, to AA_r05.json:

  * the detected edge-pixel count vs the budget (must fit),
  * PSNR of 1-spp / edge-AA / uniform-SSAA renders against a higher-order
    SSAA truth — edge-AA must recover (nearly) the uniform-SSAA quality at
    a fraction of the rays.

Run on the TPU (the 1080p ultra-truth render is a ~33 M-ray frame):
    python scripts/aa_1080p_evidence.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("TXR_COMPILE_CACHE", "/root/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from txr.apps.demo import build_scene, demo_textures
    from txr.render.render import render
    from txr.render.texture import with_mips
    from txr.render.trace import RenderConfig, auto_refraction_steps

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    W, H = (1920, 1080) if on_tpu else (192, 108)
    scene, _ = build_scene(W, H)
    textures = jax.jit(with_mips)(demo_textures())
    extra = auto_refraction_steps(scene)
    base = RenderConfig(width=W, height=H, iterations=5,
                        extra_refraction_steps=extra,
                        ray_chunk=(1 << 19) if on_tpu else 0)

    t0 = time.time()

    def run(cfg):
        img = jax.jit(lambda s, t: render(s, t, cfg),
                      static_argnums=())(scene, textures)
        return np.asarray(img, np.float64)

    img1 = run(base)                                     # 1 spp
    print(f"# base 1-spp done ({time.time()-t0:.0f}s)", file=sys.stderr)

    # edge count vs budget: the same symmetric luma edge detect the edge-AA
    # pass uses (render._edge_aa), evaluated on the 1-spp frame
    lum = img1 @ np.array([0.2126, 0.7152, 0.0722])
    dv = np.abs(np.diff(lum, axis=0))
    dh = np.abs(np.diff(lum, axis=1))
    z = np.zeros((1, W)); zc = np.zeros((H, 1))
    edge = np.maximum.reduce([
        np.concatenate([z, dv], 0), np.concatenate([dv, z], 0),
        np.concatenate([zc, dh], 1), np.concatenate([dh, zc], 1),
    ]) > base.edge_threshold
    n_edges = int(edge.sum())
    budget = base.edge_budget_mult * (H + W)
    print(f"# edges detected: {n_edges} vs budget {budget} "
          f"({n_edges/budget:.1%} used)", file=sys.stderr)

    cfg_edge = dataclasses.replace(base, supersample=4, aa_mode="edge")
    cfg_ssaa = dataclasses.replace(base, supersample=4, aa_mode="ssaa")
    # truth: 6×6 uniform SSAA like the test ladder where memory allows;
    # at 1080p that is a 74 M-ray frame — chunked, fine on the TPU
    truth_ss = 6 if on_tpu else 4
    cfg_truth = dataclasses.replace(base, supersample=truth_ss,
                                    aa_mode="ssaa")

    img_edge = run(cfg_edge)
    print(f"# edge-AA done ({time.time()-t0:.0f}s)", file=sys.stderr)
    img_ssaa = run(cfg_ssaa)
    print(f"# uniform 4x SSAA done ({time.time()-t0:.0f}s)", file=sys.stderr)
    truth = run(cfg_truth)
    print(f"# {truth_ss}x truth done ({time.time()-t0:.0f}s)", file=sys.stderr)

    def psnr(img):
        mse = float(np.mean((img - truth) ** 2))
        return 10.0 * np.log10(1.0 / max(mse, 1e-12))

    out = {
        "resolution": f"{W}x{H}",
        "device": str(dev),
        "edge_threshold": base.edge_threshold,
        "edges_detected": n_edges,
        "edge_budget": budget,
        "budget_sufficient": bool(n_edges <= budget),
        "psnr_1spp": round(psnr(img1), 2),
        "psnr_edge_aa_k4": round(psnr(img_edge), 2),
        "psnr_uniform_ssaa_k4": round(psnr(img_ssaa), 2),
        "truth_supersample": truth_ss,
        # cost model: edge-AA re-renders k²·edges rays on top of the 1-spp
        # frame; uniform SSAA pays k² everywhere
        "edge_aa_ray_cost_vs_1spp": round(
            1.0 + 16.0 * min(n_edges, budget) / (W * H), 3),
        "uniform_ssaa_ray_cost_vs_1spp": 16.0,
        "elapsed_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "AA_r05.json"), "w") as f:
        json.dump(out, f, indent=1)
    assert out["budget_sufficient"], (
        f"edge budget {budget} < detected edges {n_edges} at 1080p")


if __name__ == "__main__":
    main()
