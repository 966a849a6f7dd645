"""30-second on-TPU smoke test (VERDICT r2 item 5).

The pytest suite forces CPU (tests/conftest.py), so the compiled Mosaic
kernels and TPU numerics were only ever exercised inside bench.py's gate.
This standalone check runs the TPU-critical paths in under a minute
(post-compile) and writes TPUTEST_r{N}.json for the round record:

  1. golden gate: 96x54 demo render (fused pallas path) vs the f64 oracle
  2. pallas-vs-jnp nearest-hit + shadow cross-check on random rays
  3. fused-step vs jnp-body cross-check on-device
  4. pixel-gradient finiteness on the demo scene

Run:  python tpu_smoke.py [--out TPUTEST_r03.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

GATE_W, GATE_H = 96, 54
GATE_TOL, GATE_EDGE_FRAC = 2e-3, 0.015
GATE_EDGE_ABS = 0.5   # dual criterion: no pixel may be off by more than this


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import os

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("TXR_COMPILE_CACHE", "/root/.cache/jax_comp"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from txr.apps.demo import build_scene, demo_textures
    from txr.render.render import render_jit
    from txr.render.trace import RenderConfig, trace
    from txr.render.raygen import primary_rays
    from txr.render.texture import with_mips
    from txr.render.intersect import all_t
    from txr.kernels.pallas_intersect import nearest_hit_pallas, shadow_sweep_pallas
    from txr.ref.cpu_reference import render_oracle

    dev = jax.devices()[0]
    results = {"device": str(dev), "platform": dev.platform}
    ok_all = True
    t0 = time.time()

    scene, _ = build_scene(GATE_W, GATE_H)
    textures = demo_textures()
    cfg = RenderConfig(width=GATE_W, height=GATE_H, iterations=5)

    # 1. golden gate (fused pallas path on-device vs f64 oracle)
    got = np.asarray(render_jit(scene, textures, cfg), np.float64)
    want = np.asarray(render_oracle(scene, textures, cfg), np.float64)
    diff = np.abs(got - want).max(axis=-1)
    frac = float((diff > GATE_TOL).mean())
    from txr.utils.image import oracle_edge_mask

    interior = ~oracle_edge_mask(want)
    worst_int = float(diff[interior].max()) if interior.any() else 0.0
    gate_ok = (bool(frac <= GATE_EDGE_FRAC) and bool(np.isfinite(got).all())
               and bool(worst_int <= GATE_EDGE_ABS))
    results["golden_gate"] = {
        "frac_over_tol": round(frac, 5), "limit": GATE_EDGE_FRAC,
        "worst_interior_abs": round(worst_int, 4), "abs_limit": GATE_EDGE_ABS,
        "worst_abs": round(float(diff.max()), 4),
        "ok": gate_ok}
    ok_all &= gate_ok
    print(f"# golden gate: {frac:.3%} over tol -> {'PASS' if gate_ok else 'FAIL'}",
          file=sys.stderr)

    # 2. pallas vs jnp sweep cross-check on random rays
    rng = np.random.default_rng(0)
    R = 8192
    ro = jnp.asarray(rng.uniform(-2e4, 2e4, (R, 3)), jnp.float32)
    rd = rng.normal(size=(R, 3))
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True), jnp.float32)

    @jax.jit
    def sweeps(scene, ro, rd):
        t_p, slot_p = nearest_hit_pallas(scene, ro, rd)
        t_all = all_t(scene, ro, rd)
        t_j = jnp.min(t_all, axis=-1)
        slot_j = jnp.argmin(t_all, axis=-1)
        solid, _, _ = shadow_sweep_pallas(scene, ro, rd, jnp.full((R,), 1e4))
        return t_p, slot_p, t_j, slot_j, solid

    t_p, slot_p, t_j, slot_j, solid = map(np.asarray, sweeps(scene, ro, rd))
    fin = np.isfinite(t_j)
    t_p = np.where(np.isfinite(t_p), t_p, np.inf)
    agree_hit = float((np.isfinite(t_p) == fin).mean())
    both = fin & np.isfinite(t_p)
    rel = np.abs(t_p[both] - t_j[both]) / np.maximum(np.abs(t_j[both]), 1.0)
    sweep_ok = bool(agree_hit > 0.999) and bool((rel < 5e-3).mean() > 0.999)
    slot_agree = float((slot_p[both] == slot_j[both]).mean())
    results["sweep_crosscheck"] = {
        "hit_agree": round(agree_hit, 5), "slot_agree": round(slot_agree, 5),
        "t_rel_p999": round(float(np.quantile(rel, 0.999)) if rel.size else 0.0, 6),
        "shadow_frac": round(float(solid.mean()), 4), "ok": sweep_ok}
    ok_all &= sweep_ok
    print(f"# sweep cross-check: hit agree {agree_hit:.4%}, slot agree "
          f"{slot_agree:.4%} -> {'PASS' if sweep_ok else 'FAIL'}", file=sys.stderr)

    # 3. fused step vs jnp body on-device
    ro_p, rd_p = primary_rays(scene.camera, GATE_W, GATE_H, 1)

    # two separate executables (one program holding both paths exceeds the
    # remote-compile upload limit), textures as ARGUMENTS (closure constants
    # bake the 60MB atlas into the program and also trip the limit)
    cf = dataclasses.replace(cfg, fused="on")
    cj = dataclasses.replace(cfg, fused="off", backend="jnp")
    img_f = np.asarray(jax.jit(
        lambda s, t, o, d: trace(s, with_mips(t), cf, o, d))(
            scene, textures, ro_p, rd_p))
    img_j = np.asarray(jax.jit(
        lambda s, t, o, d: trace(s, with_mips(t), cj, o, d))(
            scene, textures, ro_p, rd_p))
    dstep = np.abs(img_f - img_j).max(axis=-1)
    frac_step = float((dstep > GATE_TOL).mean())
    fused_ok = bool(frac_step <= GATE_EDGE_FRAC) and bool(np.isfinite(img_f).all())
    results["fused_vs_jnp"] = {"frac_over_tol": round(frac_step, 5), "ok": fused_ok}
    ok_all &= fused_ok
    print(f"# fused vs jnp on-device: {frac_step:.3%} over tol -> "
          f"{'PASS' if fused_ok else 'FAIL'}", file=sys.stderr)

    # 4. gradient finiteness (camera + sphere pos through the fused VJP)
    @jax.jit
    def grad_probe(scene):
        def loss(s):
            from txr.render.render import render
            return jnp.mean(render(s, textures, cfg) ** 2)
        g = jax.grad(loss, allow_int=True)(scene)
        return (jnp.sum(jnp.abs(g.camera.pos)), jnp.sum(jnp.abs(g.spheres.pos)),
                jnp.all(jnp.isfinite(g.camera.pos)) & jnp.all(jnp.isfinite(g.spheres.pos)))

    gc, gs, gfin = map(np.asarray, grad_probe(scene))
    grad_ok = bool(gfin) and float(gc) > 0 and float(gs) > 0
    results["grad_probe"] = {
        "camera_grad_l1": float(gc), "sphere_grad_l1": float(gs), "ok": grad_ok}
    ok_all &= grad_ok
    print(f"# grad probe: finite={bool(gfin)} |dL/dcam|={float(gc):.3e} -> "
          f"{'PASS' if grad_ok else 'FAIL'}", file=sys.stderr)

    results["ok"] = bool(ok_all)
    results["wall_s"] = round(time.time() - t0, 1)
    line = json.dumps(results)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
