"""The fused bounce-step probe kernel.

Round-2 profiling showed the Pallas nearest-hit sweep is ~3% of the frame;
the other ~97% was XLA glue between sweeps: hit-info select chains, per-type
normals, texture-UV/LOD math, Fresnel, the flattened shadow call, and dozens
of [R]-sized elementwise kernels per bounce step, each a round trip through
HBM.  The reference runs the WHOLE per-pixel program as one fused GPU kernel
(rt.frag:804-902) — this module is the TPU equivalent.

One ``pallas_call`` per bounce step computes, per ray tile in VMEM:

  * the nearest-hit sweep over every primitive (calcInter, rt.frag:587-628)
  * the winner's normal / UV / material / texture request
    (get_hit_info, rt.frag:744-784)
  * the Fresnel split incl. TIR (rt.frag:711-742, 840-849)
  * per-light Phong dot products and shadow any-hit sweeps
    (calcShade/calcShade2/inShadow, rt.frag:630-709)

leaving XLA only the texture-atlas gather (memory-bound, no VPU win in
Pallas) and a short fusable elementwise tail that applies the bounce-state
update (txr/render/trace.py consumes these outputs).  Scene parameters are
SMEM scalars; materials are an SMEM table indexed by the winning slot via an
unrolled select chain — register traffic, not HBM.

Sphere spherical UV needs atan2/asin, which Mosaic does not lower; for
textured-sphere lanes the kernel emits the texturing-rotated normal instead
and XLA finishes the two transcendentals (texture.py sphere_uv).

Forward-only by design (everything is consumed under stop_gradient); the
differentiable path is the jnp body in txr/render/trace.py, invoked by the
custom VJP that wraps the fused step.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from txr.kernels.pallas_intersect import (
    TILE,
    BIG,
    INF_T,
    _rot,
    _safe_recip,
    _plane_test,
    _sphere_test,
    _surface_test,
    _box_test,
    _torus_test,
    _ring_test,
    _read_scene_refs,
    _scene_operands,
    _ray_components,
    _interpret,
    _sds,
    _match_vma,
)

_PI = 3.14159265358979
LOD_COS_MIN = 0.125     # texture.py footprint_world
MAX_DIST = 1.0e6        # maxDist, rt.frag:145

# texture-request kinds emitted per lane
KIND_NONE = 0
KIND_RGBA = 1           # textured sphere / ring: color.rgb + alpha
KIND_BOX = 2            # textured box: color.rgb * face weight
KIND_ENV = 3            # miss -> cubemap face (atlas-merged environment)


def _conj(q):
    qx, qy, qz, qw = q
    return (-qx, -qy, -qz, qw)


def _norm3(x, y, z, eps=1e-30):
    inv = 1.0 / jnp.sqrt(x * x + y * y + z * z + eps)
    return x * inv, y * inv, z * inv


def _sgn(v):
    return jnp.where(v >= 0.0, 1.0, -1.0)


def _pow_safe(base, e):
    """pow via exp/log (Mosaic has no vector-exponent pow); base clamped
    like shading._spec_pow."""
    return jnp.exp(e * jnp.log(jnp.maximum(base, 1e-12)))


def slot_bases(counts):
    """Static slot base per type, reference processing order."""
    bases = {}
    s = 0
    for name in ("planes", "spheres", "surfaces", "boxes", "toruses",
                 "rings", "lights_point"):
        bases[name] = s
        s += counts[name]
    return bases, s


# ---------------------------------------------------------------------------
# Kernel builder
# ---------------------------------------------------------------------------

def _build_step_kernel(counts, meta):
    """meta: static dict —
    n_slots, bases, n_point, n_direct, one_side, shadow_enabled,
    do_fresnel, tir, lod (bool), cube_base (int, -1 = unmerged env),
    n_atlas, shade_flipped (bool), pix_angle (float; 0 = LOD off).
    """
    bases = meta["bases"]
    n_slots = meta["n_slots"]
    n_point = meta["n_point"]
    n_direct = meta["n_direct"]
    nr = counts["rings"]
    one_side = meta["one_side"]
    L = n_point + n_direct

    def kernel(*refs):
        it = iter(refs)
        p = _read_scene_refs(counts, it)
        mat_ref = next(it)                       # [n_slots, 12] f32
        texslot_ref = next(it)                   # [n_slots, 1] int32
        texdim_ref = next(it)                    # [n_atlas|1, 2] f32
        squat_ref = next(it) if counts["spheres"] else None   # [n_sph, 4]
        plight_ref = next(it) if n_point else None            # [n_p, 6]
        dlight_ref = next(it) if n_direct else None           # [n_d, 4]
        ro_ref, rd_ref = next(it), next(it)
        # outputs
        f_ref = next(it)                         # [NF, T] f32
        i_ref = next(it)                         # [3, T] int32

        ro = _ray_components(ro_ref)
        rd = _ray_components(rd_ref)
        rox, roy, roz = ro
        rdx, rdy, rdz = rd

        # ---- nearest-hit sweep (calcInter) -------------------------------
        tmin = jnp.full(rox.shape, INF_T, jnp.float32)
        slot = jnp.zeros(rox.shape, jnp.int32)

        def accept(tmin, slot, t, hit, s):
            upd = jnp.logical_and(hit, t < tmin)
            return jnp.where(upd, t, tmin), jnp.where(upd, s, slot)

        s = 0
        for i in range(counts["planes"]):
            t, hit = _plane_test(p["ppos"], p["pnrm"], i, ro, rd, one_side)
            tmin, slot = accept(tmin, slot, t, hit, s); s += 1
        for i in range(counts["spheres"]):
            t, hit = _sphere_test(
                p["spos"][i, 0], p["spos"][i, 1], p["spos"][i, 2],
                p["srad"][i, 0], p["shol"][i, 0], ro, rd)
            tmin, slot = accept(tmin, slot, t, hit, s); s += 1
        for i in range(counts["surfaces"]):
            t, hit = _surface_test(
                p["upos"], p["uquat"], p["ucoef"], p["umin"], p["umax"], i, ro, rd)
            tmin, slot = accept(tmin, slot, t, hit, s); s += 1
        for i in range(counts["boxes"]):
            t, hit = _box_test(p["bpos"], p["bquat"], p["bform"], i, ro, rd)
            tmin, slot = accept(tmin, slot, t, hit, s); s += 1
        for i in range(counts["toruses"]):
            t, hit = _torus_test(p["tpos"], p["tquat"], p["tform"], i, ro, rd)
            tmin, slot = accept(tmin, slot, t, hit, s); s += 1
        for i in range(counts["rings"]):
            t, hit, _, _, _ = _ring_test(
                p["rpos"], p["rquat"], p["rr1"], p["rr2"], i, ro, rd)
            tmin, slot = accept(tmin, slot, t, hit, s); s += 1
        for i in range(counts["lights_point"]):
            t, hit = _sphere_test(
                p["lpos"][i, 0], p["lpos"][i, 1], p["lpos"][i, 2],
                p["lrad"][i, 0], None, ro, rd)
            tmin, slot = accept(tmin, slot, t, hit, s); s += 1
        assert s == n_slots

        hit = tmin < INF_T
        t_safe = jnp.where(hit, tmin, 0.0)
        px = rox + rdx * t_safe
        py = roy + rdy * t_safe
        pz = roz + rdz * t_safe

        # ---- winner info (get_hit_info) ----------------------------------
        zero = jnp.zeros_like(rox)
        nx = ny = nz = zero
        req_a = req_b = req_c = zero          # uv (or rotated normal)
        tex_w = zero + 1.0
        lodv = zero
        kind = jnp.zeros_like(slot)
        req_k = jnp.zeros_like(slot)

        def sel_f(rows, base, n, col):
            """Winner-select a scalar column from SMEM rows for slots
            [base, base+n) — returns a [1,T] row (0 outside)."""
            out = zero
            for i in range(n):
                out = jnp.where(slot == base + i, rows[i, col], out)
            return out

        # planes: constant normal
        if counts["planes"]:
            b0 = bases["planes"]
            for i in range(counts["planes"]):
                m = slot == b0 + i
                vx, vy, vz = p["pnrm"][i, 0], p["pnrm"][i, 1], p["pnrm"][i, 2]
                inv = 1.0 / jnp.sqrt(vx * vx + vy * vy + vz * vz + 1e-30)
                nx = jnp.where(m, vx * inv, nx)
                ny = jnp.where(m, vy * inv, ny)
                nz = jnp.where(m, vz * inv, nz)

        # spheres: n = normalize(pt - c); textured -> rotated normal out
        if counts["spheres"]:
            b0 = bases["spheres"]
            is_sph = (slot >= b0) & (slot < b0 + counts["spheres"])
            cx = sel_f(p["spos"], b0, counts["spheres"], 0)
            cy = sel_f(p["spos"], b0, counts["spheres"], 1)
            cz = sel_f(p["spos"], b0, counts["spheres"], 2)
            snx, sny, snz = _norm3(px - cx, py - cy, pz - cz)
            nx = jnp.where(is_sph, snx, nx)
            ny = jnp.where(is_sph, sny, ny)
            nz = jnp.where(is_sph, snz, nz)

        # surfaces: gradient normal in local frame
        if counts["surfaces"]:
            b0 = bases["surfaces"]
            is_su = (slot >= b0) & (slot < b0 + counts["surfaces"])
            ux = sel_f(p["upos"], b0, counts["surfaces"], 0)
            uy = sel_f(p["upos"], b0, counts["surfaces"], 1)
            uz = sel_f(p["upos"], b0, counts["surfaces"], 2)
            q = tuple(sel_f(p["uquat"], b0, counts["surfaces"], j) for j in range(4))
            ca = sel_f(p["ucoef"], b0, counts["surfaces"], 0)
            cb = sel_f(p["ucoef"], b0, counts["surfaces"], 1)
            cc = sel_f(p["ucoef"], b0, counts["surfaces"], 2)
            cd = sel_f(p["ucoef"], b0, counts["surfaces"], 3)
            ce = sel_f(p["ucoef"], b0, counts["surfaces"], 4)
            lx, ly, lz = _rot(q, (px - ux, py - uy, pz - uz))
            gx = 2.0 * ca * lx
            gy = 2.0 * cb * ly + ce
            gz = 2.0 * cc * lz + cd
            wx, wy, wz = _rot(_conj(q), (gx, gy, gz))
            wx, wy, wz = _norm3(wx, wy, wz)
            nx = jnp.where(is_su, wx, nx)
            ny = jnp.where(is_su, wy, ny)
            nz = jnp.where(is_su, wz, nz)

        # boxes: slab face normal + dominant-face uv
        if counts["boxes"]:
            b0 = bases["boxes"]
            is_bx = (slot >= b0) & (slot < b0 + counts["boxes"])
            bx_ = sel_f(p["bpos"], b0, counts["boxes"], 0)
            by_ = sel_f(p["bpos"], b0, counts["boxes"], 1)
            bz_ = sel_f(p["bpos"], b0, counts["boxes"], 2)
            q = tuple(sel_f(p["bquat"], b0, counts["boxes"], j) for j in range(4))
            fx = sel_f(p["bform"], b0, counts["boxes"], 0)
            fy = sel_f(p["bform"], b0, counts["boxes"], 1)
            fz = sel_f(p["bform"], b0, counts["boxes"], 2)
            ox, oy, oz = _rot(q, (rox - bx_, roy - by_, roz - bz_))
            dx, dy, dz = _rot(q, rd)
            mx, my, mz = _safe_recip(dx), _safe_recip(dy), _safe_recip(dz)
            t1x = -mx * ox - jnp.abs(mx) * fx
            t1y = -my * oy - jnp.abs(my) * fy
            t1z = -mz * oz - jnp.abs(mz) * fz
            gx = -_sgn(dx) * jnp.where((t1x >= t1y) & (t1x >= t1z), 1.0, 0.0)
            gy = -_sgn(dy) * jnp.where((t1y >= t1z) & (t1y >= t1x), 1.0, 0.0)
            gz = -_sgn(dz) * jnp.where((t1z >= t1x) & (t1z >= t1y), 1.0, 0.0)
            wx, wy, wz = _rot(_conj(q), (gx, gy, gz))
            nx = jnp.where(is_bx, wx, nx)
            ny = jnp.where(is_bx, wy, ny)
            nz = jnp.where(is_bx, wz, nz)

        # toruses: gradient normal
        if counts["toruses"]:
            b0 = bases["toruses"]
            is_to = (slot >= b0) & (slot < b0 + counts["toruses"])
            tx_ = sel_f(p["tpos"], b0, counts["toruses"], 0)
            ty_ = sel_f(p["tpos"], b0, counts["toruses"], 1)
            tz_ = sel_f(p["tpos"], b0, counts["toruses"], 2)
            q = tuple(sel_f(p["tquat"], b0, counts["toruses"], j) for j in range(4))
            Rm = sel_f(p["tform"], b0, counts["toruses"], 0)
            rm_ = sel_f(p["tform"], b0, counts["toruses"], 1)
            lx, ly, lz = _rot(q, (px - tx_, py - ty_, pz - tz_))
            k = lx * lx + ly * ly + lz * lz - rm_ * rm_
            R2 = Rm * Rm
            gx = lx * (k - R2)
            gy = ly * (k - R2)
            gz = lz * (k + R2)
            wx, wy, wz = _rot(_conj(q), (gx, gy, gz))
            wx, wy, wz = _norm3(wx, wy, wz)
            nx = jnp.where(is_to, wx, nx)
            ny = jnp.where(is_to, wy, ny)
            nz = jnp.where(is_to, wz, nz)

        # rings: constant -z normal (rotated); polar uv
        ring_q = None
        if counts["rings"]:
            b0 = bases["rings"]
            is_ri = (slot >= b0) & (slot < b0 + counts["rings"])
            q = tuple(sel_f(p["rquat"], b0, counts["rings"], j) for j in range(4))
            ring_q = q
            wx, wy, wz = _rot(_conj(q), (zero, zero, zero - 1.0))
            nx = jnp.where(is_ri, wx, nx)
            ny = jnp.where(is_ri, wy, ny)
            nz = jnp.where(is_ri, wz, nz)

        # ---- texture requests (uv / rotated normal, kind, atlas slot) ----
        atk = jnp.zeros_like(slot) - 1
        for i in range(n_slots):
            atk = jnp.where(slot == i, texslot_ref[i, 0], atk)
        textured = hit & (atk >= 0)

        def texdims(kidx):
            H = zero
            W = zero
            for i in range(meta["n_atlas"]):
                m = kidx == i
                H = jnp.where(m, texdim_ref[i, 0], H)
                W = jnp.where(m, texdim_ref[i, 1], W)
            return H, W

        pix_angle = meta["pix_angle"]
        if pix_angle:
            cos_in = jnp.abs(rdx * nx + rdy * ny + rdz * nz)
            fw = t_safe * pix_angle / jnp.maximum(cos_in, LOD_COS_MIN)
            tH, tW = texdims(jnp.where(textured, atk, 0))

        if counts["spheres"]:
            b0 = bases["spheres"]
            sph_tex = textured & (slot >= b0) & (slot < b0 + counts["spheres"])
            sq = tuple(sel_f(squat_ref, b0, counts["spheres"], j) for j in range(4))
            rnx, rny, rnz = _rot(sq, (nx, ny, nz))
            req_a = jnp.where(sph_tex, rnx, req_a)
            req_b = jnp.where(sph_tex, rny, req_b)
            req_c = jnp.where(sph_tex, rnz, req_c)
            kind = jnp.where(sph_tex, KIND_RGBA, kind)
            req_k = jnp.where(sph_tex, atk, req_k)
            if pix_angle:
                srad = sel_f(p["srad"], b0, counts["spheres"], 0)
                tpw = jnp.maximum(tW / (2.0 * _PI), tH / _PI) / jnp.maximum(
                    srad, 1e-6)
                lod = jnp.log2(jnp.maximum(fw * tpw, 1.0))
                lodv = jnp.where(sph_tex, lod, lodv)

        if counts["boxes"]:
            b0 = bases["boxes"]
            box_tex = textured & (slot >= b0) & (slot < b0 + counts["boxes"])
            q = tuple(sel_f(p["bquat"], b0, counts["boxes"], j) for j in range(4))
            bpx = sel_f(p["bpos"], b0, counts["boxes"], 0)
            bpy = sel_f(p["bpos"], b0, counts["boxes"], 1)
            bpz = sel_f(p["bpos"], b0, counts["boxes"], 2)
            # reference rotates box.pos by the quat, not pos-relative
            # (box_face_uv, texture.py)
            cpx, cpy, cpz = _rot(q, (bpx, bpy, bpz))
            lpx, lpy, lpz = _rot(q, (px, py, pz))
            lnx, lny, lnz = _rot(q, (nx, ny, nz))
            rx, ry, rz = lpx - cpx, lpy - cpy, lpz - cpz
            ax, ay, az = jnp.abs(lnx), jnp.abs(lny), jnp.abs(lnz)
            dom_x = (ax >= ay) & (ax >= az)
            dom_y = jnp.logical_and(~dom_x, ay >= az)
            u = jnp.where(dom_x, rz, jnp.where(dom_y, rz, rx))
            v = jnp.where(dom_x, ry, jnp.where(dom_y, rx, ry))
            w = jnp.where(dom_x, ax, jnp.where(dom_y, ay, az))
            req_a = jnp.where(box_tex, 0.5 * u - 0.5, req_a)
            req_b = jnp.where(box_tex, 0.5 * v - 0.5, req_b)
            tex_w = jnp.where(box_tex, w, tex_w)
            kind = jnp.where(box_tex, KIND_BOX, kind)
            req_k = jnp.where(box_tex, atk, req_k)
            if pix_angle:
                lod = jnp.log2(jnp.maximum(fw * 0.5 * jnp.maximum(tH, tW), 1.0))
                lodv = jnp.where(box_tex, lod, lodv)

        if counts["rings"]:
            b0 = bases["rings"]
            ring_tex = textured & (slot >= b0) & (slot < b0 + counts["rings"])
            rpx = sel_f(p["rpos"], b0, counts["rings"], 0)
            rpy = sel_f(p["rpos"], b0, counts["rings"], 1)
            rpz = sel_f(p["rpos"], b0, counts["rings"], 2)
            rr1 = sel_f(p["rr1"], b0, counts["rings"], 0)
            rr2 = sel_f(p["rr2"], b0, counts["rings"], 0)
            q = ring_q
            ox, oy, _oz = _rot(q, (rox - rpx, roy - rpy, roz - rpz))
            dx, dy, _dz = _rot(q, rd)
            hx = ox + dx * t_safe
            hy = oy + dy * t_safe
            pp = hx * hx + hy * hy
            nrm = jnp.sqrt(jnp.maximum(pp, 1e-20))
            req_a = jnp.where(ring_tex, (pp - rr1) / (rr2 - rr1), req_a)
            req_b = jnp.where(ring_tex, hx / nrm, req_b)
            kind = jnp.where(ring_tex, KIND_RGBA, kind)
            req_k = jnp.where(ring_tex, atk, req_k)
            if pix_angle:
                rmid = jnp.sqrt(jnp.maximum(0.5 * (rr1 + rr2), 1e-12))
                tpw = jnp.maximum(
                    tW * 2.0 * rmid / jnp.maximum(rr2 - rr1, 1e-12),
                    tH / (_PI * rmid))
                lod = jnp.log2(jnp.maximum(fw * tpw, 1.0))
                lodv = jnp.where(ring_tex, lod, lodv)

        # environment (miss) -> cubemap face, when merged into the atlas
        if meta["cube_base"] >= 0:
            miss = ~hit
            ax, ay, az = jnp.abs(rdx), jnp.abs(rdy), jnp.abs(rdz)
            is_x = (ax >= ay) & (ax >= az)
            is_y = jnp.logical_and(~is_x, ay >= az)
            face = jnp.where(
                is_x,
                jnp.where(rdx >= 0, 0, 1),
                jnp.where(is_y, jnp.where(rdy >= 0, 2, 3),
                          jnp.where(rdz >= 0, 4, 5)),
            ).astype(jnp.int32)
            ma = jnp.maximum(jnp.where(is_x, ax, jnp.where(is_y, ay, az)), 1e-20)
            sc = jnp.where(
                is_x, jnp.where(rdx >= 0, -rdz, rdz),
                jnp.where(is_y, rdx, jnp.where(rdz >= 0, rdx, -rdx)))
            tc = jnp.where(is_y, jnp.where(rdy >= 0, rdz, -rdz), -rdy)
            req_a = jnp.where(miss, 0.5 * (sc / ma + 1.0), req_a)
            req_b = jnp.where(miss, 0.5 * (tc / ma + 1.0), req_b)
            kind = jnp.where(miss, KIND_ENV, kind)
            req_k = jnp.where(miss, meta["cube_base"] + face, req_k)

        # ---- materials (SMEM table, slot select chain) -------------------
        mat = [zero] * 12
        for i in range(n_slots):
            m = slot == i
            for j in range(12):
                mat[j] = jnp.where(m, mat_ref[i, j], mat[j])
        (m_cr, m_cg, m_cb, m_ar, m_ag, m_ab,
         m_dif, m_refl, m_refr, m_spec, m_kd, m_ks) = mat

        # ---- facing flip + Fresnel (rt.frag:837-849) ---------------------
        ndotd = rdx * nx + rdy * ny + rdz * nz
        outside = ndotd < 0.0
        flip = jnp.where(outside, 1.0, -1.0)
        nx, ny, nz = nx * flip, ny * flip, nz * flip

        ndotv = jnp.clip(-(rdx * nx + rdy * ny + rdz * nz), 0.0, 1.0)
        schlick = m_refl + (1.0 - m_refl) * (1.0 - ndotv) ** 5
        is_refr = m_refr > 0.0
        if meta["tir"]:
            n1 = jnp.where(outside, 1.0, m_refr)
            n2 = jnp.where(outside, m_refr, 1.0)
            if meta["do_fresnel"]:
                n2s = jnp.where(jnp.abs(n2) > 1e-6, n2, 1.0)
                r0 = ((n1 - n2) / (n1 + n2s)) ** 2
                cosx = -(rdx * nx + rdy * ny + rdz * nz)
                entering = n1 > n2
                ratio = n1 / n2s
                sin_t2 = ratio * ratio * (1.0 - cosx * cosx)
                tirm = jnp.logical_and(entering, sin_t2 > 1.0)
                no_tir = sin_t2 < 1.0
                cost = jnp.sqrt(jnp.where(no_tir, 1.0 - sin_t2, 1.0))
                cosx = jnp.where(entering, jnp.where(no_tir, cost, 0.0), cosx)
                xf = 1.0 - cosx
                x2 = xf * xf
                ret = r0 + (1.0 - r0) * x2 * x2 * xf
                ret = m_refl + (1.0 - m_refl) * ret
                rm_refr = jnp.where(tirm, 1.0, ret)
            else:
                rm_refr = m_refl
            rm = jnp.where(is_refr, rm_refr, schlick)
        else:
            rm = schlick

        # ---- shading probes per light (calcShade2 + inShadow) ------------
        bias = (9e-3 * t_safe + 35.0) / 35e3      # rt.frag:780-782
        sox = px + nx * bias
        soy = py + ny * bias
        soz = pz + nz * bias
        # glossy probes shade with the UNFLIPPED normal
        # (getReflectedColor passes hit_info's normal, rt.frag:787-802)
        if meta["shade_flipped"]:
            snx, sny, snz = nx, ny, nz
        else:
            snx, sny, snz = nx * flip, ny * flip, nz * flip

        def shadow_sweep(o, d, dist):
            """inShadow solid occluders (rings separate)."""
            solid = jnp.zeros(rox.shape, jnp.bool_)

            def occl(t, h):
                return jnp.logical_and(h, t < dist)

            for i in range(counts["spheres"]):
                t, h = _sphere_test(
                    p["spos"][i, 0], p["spos"][i, 1], p["spos"][i, 2],
                    p["srad"][i, 0], None, o, d)
                solid = jnp.logical_or(solid, occl(t, h))
            for i in range(counts["surfaces"]):
                t, h = _surface_test(
                    p["upos"], p["uquat"], p["ucoef"], p["umin"], p["umax"],
                    i, o, d)
                solid = jnp.logical_or(solid, occl(t, h))
            for i in range(counts["boxes"]):
                t, h = _box_test(p["bpos"], p["bquat"], p["bform"], i, o, d)
                solid = jnp.logical_or(solid, occl(t, h))
            for i in range(counts["toruses"]):
                t, h = _torus_test(p["tpos"], p["tquat"], p["tform"], i, o, d)
                solid = jnp.logical_or(solid, occl(t, h))
            if not one_side:
                for i in range(counts["planes"]):
                    t, h = _plane_test(p["ppos"], p["pnrm"], i, o, d, one_side)
                    solid = jnp.logical_or(solid, occl(t, h))
            rings = []
            for i in range(counts["rings"]):
                t, h, x, y, pp = _ring_test(
                    p["rpos"], p["rquat"], p["rr1"], p["rr2"], i, o, d)
                h = occl(t, h)
                r1 = p["rr1"][i, 0]
                r2 = p["rr2"][i, 0]
                nrm = jnp.sqrt(jnp.maximum(pp, 1e-20))
                u = (pp - r1) / (r2 - r1)
                v = x / nrm
                rings.append((jnp.where(h, 1.0, 0.0),
                              jnp.where(h, u, 0.0), jnp.where(h, v, 0.0)))
            return jnp.where(solid, 1.0, 0.0), rings

        light_rows = []     # per light: s, spec, solid + nr*(hit,u,v)
        so = (sox, soy, soz)

        def shade_probe(ldx, ldy, ldz, dist, wgt):
            dp = jnp.clip(snx * ldx + sny * ldy + snz * ldz, 0.0, 1.0)
            s_row = dp * wgt
            lddn = ldx * snx + ldy * sny + ldz * snz
            rfx = ldx - 2.0 * lddn * snx
            rfy = ldy - 2.0 * lddn * sny
            rfz = ldz - 2.0 * lddn * snz
            sdp = jnp.clip(rdx * rfx + rdy * rfy + rdz * rfz, 0.0, 1.0)
            spec = jnp.where(m_spec > 0.0, _pow_safe(sdp, m_spec), 0.0)
            if meta["shadow_enabled"]:
                solid, rings = shadow_sweep(so, (ldx, ldy, ldz), dist)
            else:
                solid, rings = zero, [(zero, zero, zero)] * nr
            light_rows.append(s_row)
            light_rows.append(spec)
            light_rows.append(solid)
            for r3 in rings:
                light_rows.extend(r3)

        for i in range(n_point):
            lx = plight_ref[i, 0] - sox
            ly = plight_ref[i, 1] - soy
            lz = plight_ref[i, 2] - soz
            dist = jnp.sqrt(lx * lx + ly * ly + lz * lz + 1e-30)
            inv = 1.0 / dist
            intensity = plight_ref[i, 3]
            dist_div = 1.0 + plight_ref[i, 4] * dist + plight_ref[i, 5] * dist * dist
            shade_probe(lx * inv, ly * inv, lz * inv, dist, intensity / dist_div)
        for i in range(n_direct):
            dxl, dyl, dzl = dlight_ref[i, 0], dlight_ref[i, 1], dlight_ref[i, 2]
            inv = 1.0 / jnp.sqrt(dxl * dxl + dyl * dyl + dzl * dzl + 1e-30)
            shade_probe(-dxl * inv, -dyl * inv, -dzl * inv,
                        jnp.full_like(rox, MAX_DIST), dlight_ref[i, 3])

        # ---- write outputs ----------------------------------------------
        rows = [
            tmin,
            nx, ny, nz,
            jnp.where(outside, 1.0, 0.0),
            rm,
            req_a, req_b, req_c, lodv, tex_w,
            m_cr, m_cg, m_cb, m_ar, m_ag, m_ab,
            m_dif, m_refl, m_refr, m_spec, m_kd, m_ks,
        ] + light_rows
        for j, r in enumerate(rows):
            f_ref[j : j + 1, :] = r
        i_ref[0:1, :] = slot
        i_ref[1:2, :] = kind
        i_ref[2:3, :] = req_k

    NF = 23 + L * (3 + 3 * nr)
    return kernel, NF


# ---------------------------------------------------------------------------
# Host-side wrapper
# ---------------------------------------------------------------------------

def _mat_table(scene):
    """[n_slots, 12] material table in reference slot order: color3,
    absorb3, diffuse, reflect, refract, specular, kd, ks.  Light-bulb slots
    carry zeros (their hits shortcut to the light colour)."""
    rows = []
    for name in ("planes", "spheres", "surfaces", "boxes", "toruses", "rings"):
        g = getattr(scene, name)
        n = scene.counts[name]
        if not n:
            continue
        m = g.mat
        rows.append(jnp.concatenate([
            m.color, m.absorb,
            m.diffuse[:, None], m.reflect[:, None], m.refract[:, None],
            m.specular[:, None], m.kd[:, None], m.ks[:, None],
        ], axis=1))
    nl = scene.counts["lights_point"]
    if nl:
        rows.append(jnp.zeros((nl, 12), jnp.float32))
    if not rows:
        return jnp.zeros((1, 12), jnp.float32)
    return jnp.concatenate(rows, axis=0)


def _texslot_table(scene, sa):
    """[n_slots, 1] int32: atlas slot of each scene slot's texture, -1 for
    untextured (mirrors hit_info's tex_num > 0 gating)."""
    c = scene.counts
    parts = []

    def none(n):
        if n:
            parts.append(jnp.full((n,), -1, jnp.int32))

    none(c["planes"])
    if c["spheres"]:
        t = scene.spheres.texture.astype(jnp.int32)
        if sa is not None and sa.n_sphere:
            k = jnp.clip(t - 1, 0, sa.n_sphere - 1)
            parts.append(jnp.where(t > 0, k, -1))
        else:
            none(c["spheres"])
    none(c["surfaces"])
    if c["boxes"]:
        t = scene.boxes.texture.astype(jnp.int32)
        if sa is not None and sa.box_slot is not None:
            parts.append(jnp.where(t > 0, sa.box_slot, -1))
        else:
            none(c["boxes"])
    none(c["toruses"])
    if c["rings"]:
        t = scene.rings.texture.astype(jnp.int32)
        if sa is not None and sa.ring_slot is not None:
            parts.append(jnp.where(t > 0, sa.ring_slot, -1))
        else:
            none(c["rings"])
    none(c["lights_point"])
    if not parts:
        return jnp.zeros((1, 1), jnp.int32)
    return jnp.concatenate(parts)[:, None]


def _texdim_table(sa):
    """[n_atlas, 2] f32 (H0, W0) — static per topology."""
    if sa is None:
        return jnp.zeros((1, 2), jnp.float32)
    pa = sa.pa
    return jnp.asarray(np.stack([np.asarray(pa.h0, np.float32),
                                 np.asarray(pa.w0, np.float32)], axis=1))


def step_probe_pallas(scene, sa, ro, rd, *, one_side=True, shadow_enabled=True,
                      do_fresnel=True, tir=True, pix_angle=0.0,
                      shade_flipped=True):
    """Run the fused step probe.  ro, rd: [N, 3] (detached).

    Returns a dict of [N] arrays:
      t (+inf miss), slot, kind, req_k, n [N,3] (flipped), outside (bool),
      rm, req (a,b,c) [N,3], lod, tex_w, mat fields (color/absorb [N,3],
      diffuse/reflect/refract/specular/kd/ks [N]),
      light_s / light_spec / light_solid [N, L],
      ring_hit [N, L, nr] bool, ring_uv [N, L, nr, 2].
    """
    sg = jax.lax.stop_gradient
    scene, ro, rd = sg(scene), sg(ro), sg(rd)
    counts = scene.counts
    n_point = counts["lights_point"]
    n_direct = counts["lights_direct"]
    nr = counts["rings"]
    L = n_point + n_direct
    bases, n_slots = slot_bases(counts)

    meta = dict(
        bases=tuple(sorted(bases.items())), n_slots=n_slots,
        n_point=n_point, n_direct=n_direct, one_side=one_side,
        shadow_enabled=shadow_enabled, do_fresnel=do_fresnel, tir=tir,
        # environment fetches are DEFERRED to one post-loop pass
        # (txr/render/trace.py initial_state), so the kernel never emits
        # KIND_ENV requests; the face-uv block stays for callers that want
        # per-step env (cube_base >= 0 re-enables it).
        cube_base=-1,
        n_atlas=(len(sa.pa.base) if sa is not None else 1),
        pix_angle=float(pix_angle), shade_flipped=shade_flipped,
    )
    # kernel builder wants the dict form back
    meta_k = dict(meta)
    meta_k["bases"] = bases

    N = ro.shape[0]
    pad = (-N) % TILE
    roT = jnp.concatenate([ro, jnp.zeros((pad, 3), ro.dtype)]).T
    rdT = jnp.concatenate([rd, jnp.ones((pad, 3), rd.dtype)]).T
    n_pad = N + pad

    operands, in_specs = _scene_operands(scene)

    def add(a):
        operands.append(jnp.asarray(a))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    add(_mat_table(scene))
    add(_texslot_table(scene, sa))
    add(_texdim_table(sa))
    if counts["spheres"]:
        add(scene.spheres.quat)
    if n_point:
        lp = scene.lights_point
        add(jnp.concatenate([
            lp.pos, lp.intensity[:, None], lp.linear_k[:, None],
            lp.quadratic_k[:, None]], axis=1))
    if n_direct:
        ld = scene.lights_direct
        add(jnp.concatenate([ld.direction, ld.intensity[:, None]], axis=1))

    kernel, NF = _build_step_kernel(counts, meta_k)

    ray_spec = pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec((NF, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    i_spec = pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)

    # under shard_map: pcast the replicated scene/table operands to the ray
    # tile's varying type and declare outputs varying (pallas_intersect
    # _sds/_match_vma) — the fused step runs per device on a real mesh
    operands = _match_vma(operands, roT)
    f_out, i_out = pl.pallas_call(
        kernel,
        grid=(n_pad // TILE,),
        in_specs=in_specs + [ray_spec, ray_spec],
        out_specs=(f_spec, i_spec),
        out_shape=(
            _sds((NF, n_pad), jnp.float32, roT),
            _sds((3, n_pad), jnp.int32, roT),
        ),
        interpret=_interpret(),
    )(*operands, roT, rdT)

    f_out = f_out[:, :N]
    i_out = i_out[:, :N]

    r = 0

    def row(k=1):
        nonlocal r
        out = f_out[r : r + k]
        r += k
        return out[0] if k == 1 else out.T

    t = row()
    out = dict(
        t=jnp.where(t >= BIG, jnp.inf, t),
        n=row(3),
        outside=row() > 0.5,
        rm=row(),
        req=row(3),
        lod=row(),
        tex_w=row(),
        color=row(3),
        absorb=row(3),
        diffuse=row(),
        reflect=row(),
        refract=row(),
        specular=row(),
        kd=row(),
        ks=row(),
    )
    ls, lspec, lsolid = [], [], []
    rhit = [[None] * nr for _ in range(L)]
    ruv = [[None] * nr for _ in range(L)]
    for l in range(L):
        ls.append(row())
        lspec.append(row())
        lsolid.append(row())
        for j in range(nr):
            h = row()
            u = row()
            v = row()
            rhit[l][j] = h > 0.5
            ruv[l][j] = jnp.stack([u, v], axis=-1)
    assert r == NF
    out["light_s"] = jnp.stack(ls, axis=-1) if L else jnp.zeros(t.shape + (0,))
    out["light_spec"] = (
        jnp.stack(lspec, axis=-1) if L else jnp.zeros(t.shape + (0,)))
    out["light_solid"] = (
        jnp.stack(lsolid, axis=-1) if L else jnp.zeros(t.shape + (0,)))
    if L and nr:
        out["ring_hit"] = jnp.stack(
            [jnp.stack(rhit[l], axis=-1) for l in range(L)], axis=-2)
        out["ring_uv"] = jnp.stack(
            [jnp.stack(ruv[l], axis=-2) for l in range(L)], axis=-3)
    else:
        out["ring_hit"] = None
        out["ring_uv"] = None
    out["slot"] = i_out[0]
    out["kind"] = i_out[1]
    out["req_k"] = i_out[2]
    return out
