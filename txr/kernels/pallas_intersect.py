"""Fused nearest-hit Pallas kernel.

One kernel performs what calcInter (rt.frag:587-628) does for a whole ray
tile: every primitive test, in reference order, with a running (tmin, slot)
argmin — without ever materialising the [rays × primitives] t-matrix in HBM.
Ray tiles live in VMEM as [8, T] component rows (lane dim = rays); primitive
parameters are scalars in SMEM, unrolled per primitive (reference scenes
have ≤ a few dozen primitives, exactly like the shader's compile-time-sized
loops).

The kernel is forward-only by design: ``nearest_hit`` (txr/render/
intersect.py) runs it under stop_gradient and recomputes the winning
primitive's t differentiably per ray, so autodiff never needs to see the
sweep.

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


def _build_kernel(counts, one_side, n_slots):
    """Create the kernel fn for a static scene topology.

    SMEM operand order (only types with count>0 are present):
      planes:   ppos[P,3] pnrm[P,3]
      spheres:  spos[S,3] srad[S] shol[S] (int32 0/1)
      surfaces: upos[U,3] uquat[U,4] ucoef[U,6] umin[U,3] umax[U,3]
      boxes:    bpos[B,3] bquat[B,4] bform[B,3]
      toruses:  tpos[T,3] tquat[T,4] tform[T,2]
      rings:    rpos[R,3] rquat[R,4] rr1[R] rr2[R]
      lights:   lpos[L,3] lrad[L]
    """

    def kernel(*refs):
        it = iter(refs)
        if counts["planes"]:
            ppos, pnrm = next(it), next(it)
        if counts["spheres"]:
            spos, srad, shol = next(it), next(it), next(it)
        if counts["surfaces"]:
            upos, uquat, ucoef, umin, umax = (next(it) for _ in range(5))
        if counts["boxes"]:
            bpos, bquat, bform = next(it), next(it), next(it)
        if counts["toruses"]:
            tpos, tquat, tform = next(it), next(it), next(it)
        if counts["rings"]:
            rpos, rquat, rr1, rr2 = (next(it) for _ in range(4))
        if counts["lights_point"]:
            lpos, lrad = next(it), next(it)
        ro_ref, rd_ref, t_ref, slot_ref = next(it), next(it), next(it), next(it)

        rox = ro_ref[0:1, :]
        roy = ro_ref[1:2, :]
        roz = ro_ref[2:3, :]
        rdx = rd_ref[0:1, :]
        rdy = rd_ref[1:2, :]
        rdz = rd_ref[2:3, :]

        tmin = jnp.full(rox.shape, INF_T, jnp.float32)
        slot = jnp.zeros(rox.shape, jnp.int32)
        s = 0  # running slot id, reference processing order

        def accept(tmin, slot, t, hit, s):
            upd = jnp.logical_and(hit, t < tmin)
            return jnp.where(upd, t, tmin), jnp.where(upd, s, slot)

        # -- planes (rt.frag:356-370) ---------------------------------------
        for i in range(counts["planes"]):
            nx, ny, nz = pnrm[i, 0], pnrm[i, 1], pnrm[i, 2]
            px, py, pz = ppos[i, 0], ppos[i, 1], ppos[i, 2]
            denom = jnp.clip(nx * rdx + ny * rdy + nz * rdz, -1.0, 1.0)
            facing = denom < -1e-6 if one_side else jnp.abs(denom) > 1e-6
            num = (px - rox) * nx + (py - roy) * ny + (pz - roz) * nz
            t = num / jnp.where(facing, denom, 1.0)
            hit = jnp.logical_and(facing, t > 0.0)
            tmin, slot = accept(tmin, slot, t, hit, s)
            s += 1

        # -- spheres (rt.frag:342-354) --------------------------------------
        for i in range(counts["spheres"]):
            cx, cy, cz, rad = spos[i, 0], spos[i, 1], spos[i, 2], srad[i, 0]
            hol = shol[i, 0]
            ocx, ocy, ocz = rox - cx, roy - cy, roz - cz
            b = ocx * rdx + ocy * rdy + ocz * rdz
            c = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
            h = b * b - c
            has = h >= 0.0
            hs = jnp.sqrt(jnp.where(has, h, 0.0))
            t_near = -b - hs
            t_far = -b + hs
            t = jnp.where(jnp.logical_and(hol != 0, t_near < 0.0), t_far, t_near)
            hit = jnp.logical_and(has, t > 0.0)
            tmin, slot = accept(tmin, slot, t, hit, s)
            s += 1

        # -- quadric surfaces (rt.frag:499-585) -----------------------------
        for i in range(counts["surfaces"]):
            q = (uquat[i, 0], uquat[i, 1], uquat[i, 2], uquat[i, 3])
            ox, oy, oz = _rot(q, (rox - upos[i, 0], roy - upos[i, 1], roz - upos[i, 2]))
            dx, dy, dz = _rot(q, (rdx, rdy, rdz))
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

            def between(t):
                wx = rox + rdx * t
                wy = roy + rdy * t
                wz = roz + rdz * t
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
            tmin, slot = accept(tmin, slot, t, hit, s)
            s += 1

        # -- boxes (rt.frag:399-427) ----------------------------------------
        for i in range(counts["boxes"]):
            q = (bquat[i, 0], bquat[i, 1], bquat[i, 2], bquat[i, 3])
            ox, oy, oz = _rot(q, (rox - bpos[i, 0], roy - bpos[i, 1], roz - bpos[i, 2]))
            dx, dy, dz = _rot(q, (rdx, rdy, rdz))
            mx, my, mz = _safe_recip(dx), _safe_recip(dy), _safe_recip(dz)
            nx, ny, nz = mx * ox, my * oy, mz * oz
            kx = jnp.abs(mx) * bform[i, 0]
            ky = jnp.abs(my) * bform[i, 1]
            kz = jnp.abs(mz) * bform[i, 2]
            tN = jnp.maximum(jnp.maximum(-nx - kx, -ny - ky), -nz - kz)
            tF = jnp.minimum(jnp.minimum(-nx + kx, -ny + ky), -nz + kz)
            hit = jnp.logical_and(tN <= tF, tF >= 0.0)
            tmin, slot = accept(tmin, slot, tN, hit, s)
            s += 1

        # -- toruses (Ferrari closed-form quartic; txr/geometry/torus.py) ----
        # Same acceptance semantics as the reference's DK (rt.frag:478-486):
        # near-double complex pairs with |imag| ≤ 1e-3 count as hits.
        for i in range(counts["toruses"]):
            q = (tquat[i, 0], tquat[i, 1], tquat[i, 2], tquat[i, 3])
            ox, oy, oz = _rot(q, (rox - tpos[i, 0], roy - tpos[i, 1], roz - tpos[i, 2]))
            dx, dy, dz = _rot(q, (rdx, rdy, rdz))
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
            best = jnp.full_like(rox, 1e4)
            for rr_, ri2_ in ferrari_roots_tuple(*coeffs):
                rr_ = jnp.where(ri2_ > 0.0, rr_, _newton_refine(rr_, coeffs, 2))
                good = jnp.logical_and(ri2_ <= 1e-6, rr_ >= 0.0)
                best = jnp.minimum(best, jnp.where(good, rr_, 1e4))
            hit = jnp.logical_and(best > 0.0, best < 100.0)
            ts = _newton_refine(jnp.where(hit, best, 0.0), coeffs, 2)
            tmin, slot = accept(tmin, slot, ts, hit, s)
            s += 1

        # -- rings (rt.frag:372-390) ----------------------------------------
        for i in range(counts["rings"]):
            q = (rquat[i, 0], rquat[i, 1], rquat[i, 2], rquat[i, 3])
            ox, oy, oz = _rot(q, (rox - rpos[i, 0], roy - rpos[i, 1], roz - rpos[i, 2]))
            dx, dy, dz = _rot(q, (rdx, rdy, rdz))
            nzero = dz != 0.0
            t = -oz / jnp.where(nzero, dz, 1.0)
            x = ox + dx * t
            y = oy + dy * t
            p = x * x + y * y
            hit = (t > 0.0) & (p < rr2[i, 0]) & (p > rr1[i, 0]) & nzero
            tmin, slot = accept(tmin, slot, t, hit, s)
            s += 1

        # -- point-light bulbs (rt.frag:621-625) ----------------------------
        for i in range(counts["lights_point"]):
            cx, cy, cz, rad = lpos[i, 0], lpos[i, 1], lpos[i, 2], lrad[i, 0]
            ocx, ocy, ocz = rox - cx, roy - cy, roz - cz
            b = ocx * rdx + ocy * rdy + ocz * rdz
            c = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
            h = b * b - c
            has = h >= 0.0
            hs = jnp.sqrt(jnp.where(has, h, 0.0))
            t = -b - hs
            hit = jnp.logical_and(has, t > 0.0)
            tmin, slot = accept(tmin, slot, t, hit, s)
            s += 1

        assert s == n_slots
        t_ref[:] = tmin
        slot_ref[:] = slot

    return kernel


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

    smem = lambda shape: pl.BlockSpec(memory_space=pltpu.SMEM)
    operands = []
    in_specs = []

    def add(arr):
        a = jnp.asarray(arr)
        if a.ndim == 1:
            a = a[:, None]
        operands.append(a)
        in_specs.append(smem(a.shape))

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

    n_slots = (counts["planes"] + counts["spheres"] + counts["surfaces"]
               + counts["boxes"] + counts["toruses"] + counts["rings"]
               + counts["lights_point"])

    ray_spec = pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)

    kernel = _build_kernel(counts, one_side, n_slots)
    interpret = jax.devices()[0].platform == "cpu"

    t, slot = pl.pallas_call(
        kernel,
        grid=(n_pad // TILE,),
        in_specs=in_specs + [ray_spec, ray_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ),
        interpret=interpret,
    )(*operands, roT, rdT)

    t = t[0, :N]
    slot = slot[0, :N]
    return jnp.where(t >= BIG, jnp.inf, t), slot
