"""Fused scene-sweep Pallas kernels: nearest-hit and shadow any-hit.

One kernel performs what calcInter (rt.frag:587-628) / inShadow
(rt.frag:630-658) does for a whole ray tile: every primitive test, in
reference order, fused in VMEM — without ever materialising the
[rays × primitives] t-matrix in HBM.  Ray tiles live in VMEM as [k, T]
component rows (lane dim = rays); primitive parameters are scalars in SMEM,
unrolled per primitive (reference scenes have ≤ a few dozen primitives,
exactly like the shader's compile-time-sized loops).

The kernels are forward-only by design: ``nearest_hit`` (txr/render/
intersect.py) runs the sweep under stop_gradient and recomputes the winning
primitive's t differentiably per ray, and the shadow kernel feeds the
piecewise-constant visibility term (plus detached ring-hit UVs whose texture
*contents* stay differentiable), so autodiff never needs to see either sweep.

Math is the component-wise transcription of txr/geometry/intersect.py (same
semantics, same epsilons — the unit/golden tests compare the two backends
directly); the torus quartic shares torus.py's closed-form Ferrari solver
verbatim (it is rank-preserving elementwise jnp, so it runs on the [1, T]
lane tiles unchanged).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from txr.geometry.torus import ferrari_roots_tuple, _newton_refine

TILE = 2048          # rays per kernel instance (16 lanes × 128)
BIG = 1.0e30
INF_T = 3.0e38       # stand-in for +inf inside the kernel (f32 finite)


def _rot(q, v):
    """Reference rotate(): (w²−|qv|²)v + 2(qv·v)qv + 2w(qv×v).
    q = (qx,qy,qz,qw) scalars; v = (vx,vy,vz) of [1,T] vectors."""
    qx, qy, qz, qw = q
    vx, vy, vz = v
    dot = qx * vx + qy * vy + qz * vz
    cx = qy * vz - qz * vy
    cy = qz * vx - qx * vz
    cz = qx * vy - qy * vx
    k = qw * qw - (qx * qx + qy * qy + qz * qz)
    return (
        k * vx + 2.0 * dot * qx + 2.0 * qw * cx,
        k * vy + 2.0 * dot * qy + 2.0 * qw * cy,
        k * vz + 2.0 * dot * qz + 2.0 * qw * cz,
    )


def _safe_recip(v):
    mag = jnp.maximum(jnp.abs(v), 1.0 / BIG)
    return jnp.where(v >= 0.0, 1.0, -1.0) / mag


# ---------------------------------------------------------------------------
# Per-type tile tests (shared by both kernels).  ro/rd are (x, y, z) tuples
# of [1, T] rows; primitive parameters are SMEM scalars.  Each returns
# (t, hit) for one primitive against the whole tile.
# ---------------------------------------------------------------------------

def _plane_test(ppos, pnrm, i, ro, rd, one_side):
    """rt.frag:356-370."""
    rox, roy, roz = ro
    rdx, rdy, rdz = rd
    nx, ny, nz = pnrm[i, 0], pnrm[i, 1], pnrm[i, 2]
    px, py, pz = ppos[i, 0], ppos[i, 1], ppos[i, 2]
    denom = jnp.clip(nx * rdx + ny * rdy + nz * rdz, -1.0, 1.0)
    facing = denom < -1e-6 if one_side else jnp.abs(denom) > 1e-6
    num = (px - rox) * nx + (py - roy) * ny + (pz - roz) * nz
    t = num / jnp.where(facing, denom, 1.0)
    hit = jnp.logical_and(facing, t > 0.0)
    return t, hit


def _sphere_test(cx, cy, cz, rad, hol, ro, rd):
    """rt.frag:342-354.  hol: SMEM int scalar, or None = never hollow
    (shadow rays and light bulbs test spheres solid, rt.frag:636,:621)."""
    rox, roy, roz = ro
    rdx, rdy, rdz = rd
    ocx, ocy, ocz = rox - cx, roy - cy, roz - cz
    b = ocx * rdx + ocy * rdy + ocz * rdz
    c = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
    h = b * b - c
    has = h >= 0.0
    hs = jnp.sqrt(jnp.where(has, h, 0.0))
    t_near = -b - hs
    if hol is None:
        t = t_near
    else:
        t = jnp.where(jnp.logical_and(hol != 0, t_near < 0.0), -b + hs, t_near)
    hit = jnp.logical_and(has, t > 0.0)
    return t, hit


def _surface_test(upos, uquat, ucoef, umin, umax, i, ro, rd):
    """rt.frag:499-585 incl. the world-space clip box."""
    rox, roy, roz = ro
    q = (uquat[i, 0], uquat[i, 1], uquat[i, 2], uquat[i, 3])
    ox, oy, oz = _rot(q, (rox - upos[i, 0], ro[1] - upos[i, 1], ro[2] - upos[i, 2]))
    dx, dy, dz = _rot(q, rd)
    a, b, c = ucoef[i, 0], ucoef[i, 1], ucoef[i, 2]
    d, e, f = ucoef[i, 3], ucoef[i, 4], ucoef[i, 5]
    p1 = 2 * a * dx * ox + 2 * b * dy * oy + 2 * c * dz * oz + d * dz + dy * e
    p2 = a * dx * dx + b * dy * dy + c * dz * dz
    p3 = a * ox * ox + b * oy * oy + c * oz * oz + d * oz + e * oy + f
    disc = p1 * p1 - 4.0 * p2 * p3
    ok = jnp.logical_and(disc >= 0.0, jnp.abs(p2) >= 1e-6)
    p4 = jnp.sqrt(jnp.where(ok, disc, 0.0))
    inv2p2 = jnp.where(ok, 1.0, 0.0) / jnp.where(ok, 2.0 * p2, 1.0)
    t1 = (-p1 - p4) * inv2p2
    t2 = (-p1 + p4) * inv2p2
    eps = 1e-4
    t1ok = t1 > eps
    t2ok = t2 > eps
    lo = jnp.minimum(t1, t2)
    hi = jnp.maximum(t1, t2)
    both = jnp.logical_and(t1ok, t2ok)
    near = jnp.where(both, lo, jnp.where(t1ok, t1, jnp.where(t2ok, t2, INF_T)))
    far = jnp.where(both, hi, jnp.where(t1ok, t2, jnp.where(t2ok, t1, INF_T)))

    rdx, rdy, rdz = rd

    def between(t):
        wx = rox + rdx * t
        wy = ro[1] + rdy * t
        wz = ro[2] + rdz * t
        return (
            (wx > umin[i, 0]) & (wx < umax[i, 0])
            & (wy > umin[i, 1]) & (wy < umax[i, 1])
            & (wz > umin[i, 2]) & (wz < umax[i, 2])
        )

    near_fin = near < INF_T
    near_in = jnp.logical_and(near_fin, between(jnp.where(near_fin, near, 0.0)))
    far_ok = jnp.logical_and(far >= eps, far < INF_T)
    far_in = jnp.logical_and(far_ok, between(jnp.where(far_ok, far, 0.0)))
    t = jnp.where(near_in, near, jnp.where(far_in, far, INF_T))
    hit = jnp.logical_and(ok, t < INF_T)
    return t, hit


def _box_test(bpos, bquat, bform, i, ro, rd):
    """rt.frag:399-427 (iq slab test; tN may be negative inside — parity)."""
    q = (bquat[i, 0], bquat[i, 1], bquat[i, 2], bquat[i, 3])
    ox, oy, oz = _rot(q, (ro[0] - bpos[i, 0], ro[1] - bpos[i, 1], ro[2] - bpos[i, 2]))
    dx, dy, dz = _rot(q, rd)
    mx, my, mz = _safe_recip(dx), _safe_recip(dy), _safe_recip(dz)
    nx, ny, nz = mx * ox, my * oy, mz * oz
    kx = jnp.abs(mx) * bform[i, 0]
    ky = jnp.abs(my) * bform[i, 1]
    kz = jnp.abs(mz) * bform[i, 2]
    tN = jnp.maximum(jnp.maximum(-nx - kx, -ny - ky), -nz - kz)
    tF = jnp.minimum(jnp.minimum(-nx + kx, -ny + ky), -nz + kz)
    hit = jnp.logical_and(tN <= tF, tF >= 0.0)
    return tN, hit


def _torus_test(tpos, tquat, tform, i, ro, rd):
    """Ferrari closed-form quartic (txr/geometry/torus.py); same acceptance
    semantics as the reference's DK (rt.frag:478-486)."""
    q = (tquat[i, 0], tquat[i, 1], tquat[i, 2], tquat[i, 3])
    ox, oy, oz = _rot(q, (ro[0] - tpos[i, 0], ro[1] - tpos[i, 1], ro[2] - tpos[i, 2]))
    dx, dy, dz = _rot(q, rd)
    R = tform[i, 0]
    r = tform[i, 1]
    A = dx * dx + dy * dy + dz * dz
    Bq = 2.0 * (ox * dx + oy * dy + oz * dz)
    R2 = R * R
    Cq = ox * ox + oy * oy + oz * oz + R2 - r * r
    a2 = dx * dx + dy * dy
    b2 = 2.0 * (ox * dx + oy * dy)
    c2 = ox * ox + oy * oy
    coeffs = (
        A * A,
        2.0 * A * Bq,
        Bq * Bq + 2.0 * A * Cq - 4.0 * R2 * a2,
        2.0 * Bq * Cq - 4.0 * R2 * b2,
        Cq * Cq - 4.0 * R2 * c2,
    )
    best = jnp.full_like(ro[0], 1e4)
    for rr_, ri2_ in ferrari_roots_tuple(*coeffs):
        rr_ = jnp.where(ri2_ > 0.0, rr_, _newton_refine(rr_, coeffs, 2))
        good = jnp.logical_and(ri2_ <= 1e-6, rr_ >= 0.0)
        best = jnp.minimum(best, jnp.where(good, rr_, 1e4))
    hit = jnp.logical_and(best > 0.0, best < 100.0)
    t = _newton_refine(jnp.where(hit, best, 0.0), coeffs, 2)
    return t, hit


def _ring_test(rpos, rquat, rr1, rr2, i, ro, rd):
    """rt.frag:372-390.  Also returns the in-plane hit coords (x, y) and
    radius² p for UV (rt.frag:385-386)."""
    q = (rquat[i, 0], rquat[i, 1], rquat[i, 2], rquat[i, 3])
    ox, oy, oz = _rot(q, (ro[0] - rpos[i, 0], ro[1] - rpos[i, 1], ro[2] - rpos[i, 2]))
    dx, dy, dz = _rot(q, rd)
    nzero = dz != 0.0
    t = -oz / jnp.where(nzero, dz, 1.0)
    x = ox + dx * t
    y = oy + dy * t
    p = x * x + y * y
    hit = (t > 0.0) & (p < rr2[i, 0]) & (p > rr1[i, 0]) & nzero
    return t, hit, x, y, p


def _read_scene_refs(counts, it):
    """Pull the SMEM scene operands off the ref iterator, in the canonical
    order (see _scene_operands)."""
    d = {}
    if counts["planes"]:
        d["ppos"], d["pnrm"] = next(it), next(it)
    if counts["spheres"]:
        d["spos"], d["srad"], d["shol"] = next(it), next(it), next(it)
    if counts["surfaces"]:
        d["upos"], d["uquat"], d["ucoef"], d["umin"], d["umax"] = (
            next(it) for _ in range(5)
        )
    if counts["boxes"]:
        d["bpos"], d["bquat"], d["bform"] = next(it), next(it), next(it)
    if counts["toruses"]:
        d["tpos"], d["tquat"], d["tform"] = next(it), next(it), next(it)
    if counts["rings"]:
        d["rpos"], d["rquat"], d["rr1"], d["rr2"] = (next(it) for _ in range(4))
    if counts["lights_point"]:
        d["lpos"], d["lrad"] = next(it), next(it)
    return d


def _scene_operands(scene):
    """SMEM operand list + specs for a scene's primitive parameters."""
    counts = scene.counts
    operands = []
    in_specs = []

    def add(arr):
        a = jnp.asarray(arr)
        if a.ndim == 1:
            a = a[:, None]
        operands.append(a)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    if counts["planes"]:
        add(scene.planes.pos)
        add(scene.planes.normal)
    if counts["spheres"]:
        add(scene.spheres.pos)
        add(scene.spheres.radius)
        add(scene.spheres.hollow.astype(jnp.int32))
    if counts["surfaces"]:
        su = scene.surfaces
        add(su.pos); add(su.quat); add(su.coef)
        # clamp ±FLT_MAX clip boxes into kernel-safe range
        add(jnp.maximum(su.v_min, -INF_T)); add(jnp.minimum(su.v_max, INF_T))
    if counts["boxes"]:
        add(scene.boxes.pos); add(scene.boxes.quat); add(scene.boxes.form)
    if counts["toruses"]:
        add(scene.toruses.pos); add(scene.toruses.quat); add(scene.toruses.form)
    if counts["rings"]:
        r = scene.rings
        add(r.pos); add(r.quat); add(r.r1); add(r.r2)
    if counts["lights_point"]:
        add(scene.lights_point.pos); add(scene.lights_point.radius)
    return operands, in_specs


def _ray_components(ref3, name_unused=None):
    return (ref3[0:1, :], ref3[1:2, :], ref3[2:3, :])


# ---------------------------------------------------------------------------
# Nearest-hit kernel (calcInter, rt.frag:587-628)
# ---------------------------------------------------------------------------

def _build_kernel(counts, one_side, n_slots):
    """Nearest-hit kernel for a static scene topology: running (tmin, slot)
    argmin over every primitive in reference processing order."""

    def kernel(*refs):
        it = iter(refs)
        p = _read_scene_refs(counts, it)
        ro_ref, rd_ref, t_ref, slot_ref = next(it), next(it), next(it), next(it)

        ro = _ray_components(ro_ref)
        rd = _ray_components(rd_ref)

        tmin = jnp.full(ro[0].shape, INF_T, jnp.float32)
        slot = jnp.zeros(ro[0].shape, jnp.int32)
        s = 0  # running slot id, reference processing order

        def accept(tmin, slot, t, hit, s):
            upd = jnp.logical_and(hit, t < tmin)
            return jnp.where(upd, t, tmin), jnp.where(upd, s, slot)

        for i in range(counts["planes"]):
            t, hit = _plane_test(p["ppos"], p["pnrm"], i, ro, rd, one_side)
            tmin, slot = accept(tmin, slot, t, hit, s)
            s += 1
        for i in range(counts["spheres"]):
            t, hit = _sphere_test(
                p["spos"][i, 0], p["spos"][i, 1], p["spos"][i, 2],
                p["srad"][i, 0], p["shol"][i, 0], ro, rd,
            )
            tmin, slot = accept(tmin, slot, t, hit, s)
            s += 1
        for i in range(counts["surfaces"]):
            t, hit = _surface_test(
                p["upos"], p["uquat"], p["ucoef"], p["umin"], p["umax"], i, ro, rd
            )
            tmin, slot = accept(tmin, slot, t, hit, s)
            s += 1
        for i in range(counts["boxes"]):
            t, hit = _box_test(p["bpos"], p["bquat"], p["bform"], i, ro, rd)
            tmin, slot = accept(tmin, slot, t, hit, s)
            s += 1
        for i in range(counts["toruses"]):
            t, hit = _torus_test(p["tpos"], p["tquat"], p["tform"], i, ro, rd)
            tmin, slot = accept(tmin, slot, t, hit, s)
            s += 1
        for i in range(counts["rings"]):
            t, hit, _, _, _ = _ring_test(
                p["rpos"], p["rquat"], p["rr1"], p["rr2"], i, ro, rd
            )
            tmin, slot = accept(tmin, slot, t, hit, s)
            s += 1
        for i in range(counts["lights_point"]):
            # light bulbs are plain (non-hollow) spheres, rt.frag:621-625
            t, hit = _sphere_test(
                p["lpos"][i, 0], p["lpos"][i, 1], p["lpos"][i, 2],
                p["lrad"][i, 0], None, ro, rd,
            )
            tmin, slot = accept(tmin, slot, t, hit, s)
            s += 1

        assert s == n_slots
        t_ref[:] = tmin
        slot_ref[:] = slot

    return kernel


def _interpret():
    return jax.devices()[0].platform == "cpu"


def _sds(shape, dtype, like):
    """ShapeDtypeStruct matching ``like``'s varying-across-mesh-axes type —
    required under shard_map(check_vma=True) (pallas outputs must declare
    their vma; inherit it from the ray input so the kernels work both
    standalone and inside a sharded ray tile)."""
    vma = getattr(jax.typeof(like), "vma", None)
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


def _match_vma(operands, like):
    """pcast replicated operands to ``like``'s vma so every pallas input
    shares one varying type under shard_map (mixed-vma kernel bodies are
    rejected by the VMA checker)."""
    vma = getattr(jax.typeof(like), "vma", None)
    if not vma:
        return operands
    axes = tuple(vma)
    return [jax.lax.pcast(o, axes, to="varying") for o in operands]


@functools.partial(jax.jit, static_argnums=(3,))
def nearest_hit_pallas(scene, ro, rd, one_side=True):
    """Fused sweep → (tmin [N], slot [N]).  tmin ≥ 1e30 means miss.

    ro, rd: [N, 3].  The kernel runs over [3, T]-tiled transposed rays.
    """
    counts = scene.counts
    N = ro.shape[0]
    pad = (-N) % TILE
    roT = jnp.concatenate([ro, jnp.zeros((pad, 3), ro.dtype)]).T  # [3, N+pad]
    rdT = jnp.concatenate([rd, jnp.ones((pad, 3), rd.dtype)]).T
    n_pad = N + pad

    operands, in_specs = _scene_operands(scene)
    n_slots = sum(
        counts[k]
        for k in (
            "planes", "spheres", "surfaces", "boxes", "toruses", "rings",
            "lights_point",
        )
    )

    ray_spec = pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)

    kernel = _build_kernel(counts, one_side, n_slots)

    operands = _match_vma(operands, roT)
    t, slot = pl.pallas_call(
        kernel,
        grid=(n_pad // TILE,),
        in_specs=in_specs + [ray_spec, ray_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(
            _sds((1, n_pad), jnp.float32, roT),
            _sds((1, n_pad), jnp.int32, roT),
        ),
        interpret=_interpret(),
    )(*operands, roT, rdT)

    t = t[0, :N]
    slot = slot[0, :N]
    return jnp.where(t >= BIG, jnp.inf, t), slot


# ---------------------------------------------------------------------------
# Shadow any-hit kernel (inShadow, rt.frag:630-658)
# ---------------------------------------------------------------------------

def _build_shadow_kernel(counts, one_side):
    """Any-hit over the occluder set: spheres (tested solid, rt.frag:636),
    surfaces, boxes, toruses, and two-sided planes (one-sided planes don't
    occlude, rt.frag:652-655).  Rings are NOT folded into the solid mask —
    their (hit, u, v) emerge per ring so the caller can apply the
    texture-alpha attenuation (rt.frag:643-651) outside the kernel."""

    def kernel(*refs):
        it = iter(refs)
        p = _read_scene_refs(counts, it)
        ro_ref, rd_ref, dist_ref = next(it), next(it), next(it)
        solid_ref = next(it)
        ring_ref = next(it) if counts["rings"] else None

        ro = _ray_components(ro_ref)
        rd = _ray_components(rd_ref)
        dist = dist_ref[0:1, :]

        solid = jnp.zeros(ro[0].shape, jnp.bool_)

        def occl(t, hit):
            return jnp.logical_and(hit, t < dist)

        for i in range(counts["spheres"]):
            t, hit = _sphere_test(
                p["spos"][i, 0], p["spos"][i, 1], p["spos"][i, 2],
                p["srad"][i, 0], None, ro, rd,
            )
            solid = jnp.logical_or(solid, occl(t, hit))
        for i in range(counts["surfaces"]):
            t, hit = _surface_test(
                p["upos"], p["uquat"], p["ucoef"], p["umin"], p["umax"], i, ro, rd
            )
            solid = jnp.logical_or(solid, occl(t, hit))
        for i in range(counts["boxes"]):
            t, hit = _box_test(p["bpos"], p["bquat"], p["bform"], i, ro, rd)
            solid = jnp.logical_or(solid, occl(t, hit))
        for i in range(counts["toruses"]):
            t, hit = _torus_test(p["tpos"], p["tquat"], p["tform"], i, ro, rd)
            solid = jnp.logical_or(solid, occl(t, hit))
        if not one_side:
            for i in range(counts["planes"]):
                t, hit = _plane_test(p["ppos"], p["pnrm"], i, ro, rd, one_side)
                solid = jnp.logical_or(solid, occl(t, hit))

        solid_ref[:] = solid.astype(jnp.float32)

        for i in range(counts["rings"]):
            t, hit, x, y, pp = _ring_test(
                p["rpos"], p["rquat"], p["rr1"], p["rr2"], i, ro, rd
            )
            h = occl(t, hit)
            # UV per gi.ring_uv: u = (p − r1)/(r2 − r1), v = x/|xy|
            r1 = p["rr1"][i, 0]
            r2 = p["rr2"][i, 0]
            norm = jnp.sqrt(jnp.maximum(pp, 1e-20))
            u = (pp - r1) / (r2 - r1)
            v = x / norm
            ring_ref[3 * i : 3 * i + 1, :] = h.astype(jnp.float32)
            ring_ref[3 * i + 1 : 3 * i + 2, :] = jnp.where(h, u, 0.0)
            ring_ref[3 * i + 2 : 3 * i + 3, :] = jnp.where(h, v, 0.0)

    return kernel


@functools.partial(jax.jit, static_argnums=(4,))
def shadow_sweep_pallas(scene, ro, rd, dist, one_side=True):
    """Fused any-hit sweep → (solid [N] f32 0/1, ring_hit [N, nr] bool,
    ring_uv [N, nr, 2]).  ro, rd: [N, 3]; dist: [N] (occluders must sit
    closer than the light)."""
    counts = scene.counts
    nr = counts["rings"]
    N = ro.shape[0]
    pad = (-N) % TILE
    roT = jnp.concatenate([ro, jnp.zeros((pad, 3), ro.dtype)]).T
    rdT = jnp.concatenate([rd, jnp.ones((pad, 3), rd.dtype)]).T
    distP = jnp.concatenate([dist, jnp.zeros((pad,), dist.dtype)])[None, :]
    n_pad = N + pad

    operands, in_specs = _scene_operands(scene)

    ray_spec = pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    dist_spec = pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_specs = [pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)]
    out_shape = [_sds((1, n_pad), jnp.float32, roT)]
    if nr:
        out_specs.append(
            pl.BlockSpec((3 * nr, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        out_shape.append(_sds((3 * nr, n_pad), jnp.float32, roT))

    kernel = _build_shadow_kernel(counts, one_side)

    operands = _match_vma(operands, roT)
    outs = pl.pallas_call(
        kernel,
        grid=(n_pad // TILE,),
        in_specs=in_specs + [ray_spec, ray_spec, dist_spec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=_interpret(),
    )(*operands, roT, rdT, distP)

    solid = outs[0][0, :N]
    if not nr:
        return solid, None, None
    rings = outs[1][:, :N]                     # [3·nr, N]
    ring_hit = rings[0::3].T > 0.5             # [N, nr]
    ring_uv = jnp.stack([rings[1::3].T, rings[2::3].T], axis=-1)  # [N, nr, 2]
    return solid, ring_hit, ring_uv
