"""Nearest-hit and any-hit queries over the whole scene.

This is the TPU re-design of ``calcInter`` (rt.frag:587-628) and
``inShadow`` (rt.frag:630-658).  Instead of serial per-primitive loops with a
running (tmin, num, type), every ray×primitive test is evaluated at once and
the winner comes from one argmin over the concatenated primitive axis.

Tie semantics match the reference exactly: the GLSL loops use a strict
``t < tmin`` and process types in the order planes → spheres → surfaces →
boxes → toruses → rings → point-light bulbs, so on an exact tie the earlier
type/index wins.  ``jnp.argmin`` returns the first occurrence of the
minimum, so concatenating the per-type t-arrays in the same order reproduces
the behaviour bit-for-bit.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from txr.geometry import intersect as gi
from txr.utils.gather import small_take
from txr.scene.types import (
    Scene,
    TYPE_SPHERE,
    TYPE_PLANE,
    TYPE_SURFACE,
    TYPE_BOX,
    TYPE_TORUS,
    TYPE_RING,
    TYPE_POINT_LIGHT,
)

MAX_DIST = gi.MAX_DIST


def _type_tables(scene: Scene):
    """Static per-slot (type, index) tables for the concatenated t array."""
    c = scene.counts
    order = [
        (TYPE_PLANE, c["planes"]),
        (TYPE_SPHERE, c["spheres"]),
        (TYPE_SURFACE, c["surfaces"]),
        (TYPE_BOX, c["boxes"]),
        (TYPE_TORUS, c["toruses"]),
        (TYPE_RING, c["rings"]),
        (TYPE_POINT_LIGHT, c["lights_point"]),
    ]
    types, idxs = [], []
    for ty, n in order:
        types += [ty] * n
        idxs += list(range(n))
    return (
        jnp.asarray(np.array(types, np.int32)),
        jnp.asarray(np.array(idxs, np.int32)),
    )


def all_t(scene: Scene, ro, rd, one_side_planes=True):
    """t for every (ray, primitive-slot) pair, [R, N_total], +inf = miss.

    Slot order matches the reference's processing order (see module doc).
    """
    parts = []
    c = scene.counts
    if c["planes"]:
        parts.append(
            gi.plane_t(ro, rd, scene.planes.pos, scene.planes.normal, one_side_planes)
        )
    if c["spheres"]:
        parts.append(
            gi.sphere_t(ro, rd, scene.spheres.pos, scene.spheres.radius, scene.spheres.hollow)
        )
    if c["surfaces"]:
        s = scene.surfaces
        parts.append(gi.surface_t(ro, rd, s.pos, s.quat, s.coef, s.v_min, s.v_max))
    if c["boxes"]:
        b = scene.boxes
        parts.append(gi.box_t(ro, rd, b.pos, b.quat, b.form))
    if c["toruses"]:
        t = scene.toruses
        parts.append(gi.torus_t(ro, rd, t.pos, t.quat, t.form))
    if c["rings"]:
        r = scene.rings
        parts.append(gi.ring_t(ro, rd, r.pos, r.quat, r.r1, r.r2))
    if c["lights_point"]:
        lp = scene.lights_point
        # light bulbs are plain (non-hollow) spheres, rt.frag:621-625
        parts.append(
            gi.sphere_t(ro, rd, lp.pos, lp.radius, jnp.zeros(lp.pos.shape[0], bool))
        )
    if not parts:
        return jnp.full(ro.shape[:-1] + (0,), jnp.inf, ro.dtype)
    return jnp.concatenate(parts, axis=-1)


def t_of_winner(scene: Scene, ro, rd, ty, idx, one_side_planes=True, t0=None):
    """Differentiable t for an already-chosen (type, index) winner per ray.

    Gathers the single winning primitive's parameters and re-runs its
    intersector — O(R) instead of O(R·P) — so the backward pass touches one
    primitive per ray.  The discrete (ty, idx) choice is piecewise constant
    in the scene parameters, so detaching it is exact away from silhouettes
    (the same argument as the argmin itself).

    ``t0``: the sweep's detached winning t (+inf on miss).  The torus branch
    needs it: instead of re-running the 60-iteration Durand–Kerner solve it
    Newton-polishes from t0 (torus_polish_t) — same value, same implicit
    gradient, no iteration loop in the backward-visible path.
    """
    c = scene.counts
    R = ty.shape
    t = jnp.full(R, jnp.inf, ro.dtype)

    def one(t_rp):
        # [R, 1] single-primitive result → [R]
        return t_rp[..., 0]

    if c["planes"]:
        i = jnp.clip(idx, 0, c["planes"] - 1)
        tv = one(
            gi.plane_t(ro, rd, small_take(scene.planes.pos, i)[..., None, :],
                       small_take(scene.planes.normal, i)[..., None, :],
                       one_side_planes)
        )
        t = jnp.where(ty == TYPE_PLANE, tv, t)
    if c["spheres"]:
        sp = scene.spheres
        i = jnp.clip(idx, 0, c["spheres"] - 1)
        tv = one(
            gi.sphere_t(ro, rd, small_take(sp.pos, i)[..., None, :],
                        small_take(sp.radius, i)[..., None],
                        small_take(sp.hollow, i)[..., None])
        )
        t = jnp.where(ty == TYPE_SPHERE, tv, t)
    if c["surfaces"]:
        s = scene.surfaces
        i = jnp.clip(idx, 0, c["surfaces"] - 1)
        tv = one(
            gi.surface_t(ro, rd, small_take(s.pos, i)[..., None, :],
                         small_take(s.quat, i)[..., None, :],
                         small_take(s.coef, i)[..., None, :],
                         small_take(s.v_min, i)[..., None, :],
                         small_take(s.v_max, i)[..., None, :])
        )
        t = jnp.where(ty == TYPE_SURFACE, tv, t)
    if c["boxes"]:
        b = scene.boxes
        i = jnp.clip(idx, 0, c["boxes"] - 1)
        tv = one(
            gi.box_t(ro, rd, small_take(b.pos, i)[..., None, :],
                     small_take(b.quat, i)[..., None, :],
                     small_take(b.form, i)[..., None, :])
        )
        t = jnp.where(ty == TYPE_BOX, tv, t)
    if c["toruses"]:
        to = scene.toruses
        i = jnp.clip(idx, 0, c["toruses"] - 1)
        if t0 is not None:
            from txr.geometry.torus import torus_polish_t

            tor_t0 = jnp.where(ty == TYPE_TORUS, t0, jnp.inf)
            tv = torus_polish_t(ro, rd, small_take(to.pos, i),
                                small_take(to.quat, i), small_take(to.form, i),
                                tor_t0)
        else:
            tv = one(
                gi.torus_t(ro, rd, small_take(to.pos, i)[..., None, :],
                           small_take(to.quat, i)[..., None, :],
                           small_take(to.form, i)[..., None, :])
            )
        t = jnp.where(ty == TYPE_TORUS, tv, t)
    if c["rings"]:
        r = scene.rings
        i = jnp.clip(idx, 0, c["rings"] - 1)
        tv = one(
            gi.ring_t(ro, rd, small_take(r.pos, i)[..., None, :],
                      small_take(r.quat, i)[..., None, :],
                      small_take(r.r1, i)[..., None],
                      small_take(r.r2, i)[..., None])
        )
        t = jnp.where(ty == TYPE_RING, tv, t)
    if c["lights_point"]:
        lp = scene.lights_point
        i = jnp.clip(idx, 0, c["lights_point"] - 1)
        tv = one(
            gi.sphere_t(ro, rd, small_take(lp.pos, i)[..., None, :],
                        small_take(lp.radius, i)[..., None],
                        jnp.zeros(R + (1,), bool))
        )
        t = jnp.where(ty == TYPE_POINT_LIGHT, tv, t)
    return t


def nearest_hit_saved(scene: Scene, ro, rd, slot, t0, one_side_planes=True):
    """calcInter from a SAVED sweep winner: decode (ty, idx) from the
    forward probe's slot and recompute the ONE winning intersector per ray
    (t_of_winner) — the O(R) differentiable path the backward pass uses
    instead of re-running the O(R·P) sweep (trace._fused_step_bwd).

    The winner choice is piecewise constant in the scene parameters, so a
    saved (slot, t0) from the forward probe yields exactly the gradients of
    nearest_hit's custom VJP; the recomputed t may differ from t0 by ulps,
    which only moves the linearisation point."""
    type_tab, idx_tab = _type_tables(scene)
    slot = slot.astype(jnp.int32)
    hit = jnp.isfinite(t0)
    ty = jnp.where(hit, small_take(type_tab, slot), -1)
    idx = small_take(idx_tab, slot)
    t = t_of_winner(scene, ro, rd, ty, idx, one_side_planes, t0=t0)
    # grazing lanes where the recompute lands on the miss side keep the
    # saved t so the consume's branch masks agree with the forward's
    t = jnp.where(hit & ~jnp.isfinite(t), t0, t)
    return jnp.where(hit, t, jnp.inf), ty, idx


def resolve_backend(backend, ro):
    """"auto" → pallas off-CPU.  Inside shard_map (rays carry a varying
    mesh type) the pallas kernels still run on real devices — their
    operands/outputs are pcast to one varying type (pallas_intersect._sds/
    _match_vma), the per-device analog of the reference running its full
    fused kernel per GPU (GLWrapper.cpp:165).  Only CPU interpret mode
    downgrades to the jnp body: interpret-mode pallas mixes the varying ray
    tiles with replicated interpreter constants, which the VMA checker
    rejects (tests/test_sharding.py runs this path on the virtual CPU
    mesh)."""
    if backend == "auto":
        backend = "jnp" if jax.default_backend() == "cpu" else "pallas"
    if (
        backend == "pallas"
        and getattr(jax.typeof(ro), "vma", None)
        and jax.default_backend() == "cpu"
    ):
        backend = "jnp"
    return backend


def _sweep(scene: Scene, ro, rd, one_side_planes, backend):
    """The detached winner search: → (t0 [R] with +inf miss, ty, idx)."""
    backend = resolve_backend(backend, ro)
    sg = jax.lax.stop_gradient
    type_tab, idx_tab = _type_tables(scene)
    if backend == "pallas":
        from txr.kernels.pallas_intersect import nearest_hit_pallas

        t0, slot = nearest_hit_pallas(sg(scene), sg(ro), sg(rd), one_side_planes)
    else:
        t_all = sg(all_t(scene, ro, rd, one_side_planes))
        slot = jnp.argmin(t_all, axis=-1)
        t0 = jnp.min(t_all, axis=-1)
    hit = t0 < MAX_DIST
    ty = jnp.where(hit, small_take(type_tab, slot), -1)
    idx = small_take(idx_tab, slot)
    return jnp.where(hit, t0, jnp.inf), ty, idx


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _nearest_hit_diff(scene, ro, rd, one_side_planes, backend):
    return _sweep(scene, ro, rd, one_side_planes, backend)


def _nearest_hit_fwd(scene, ro, rd, one_side_planes, backend):
    out = _sweep(scene, ro, rd, one_side_planes, backend)
    t0, ty, idx = out
    return out, (scene, ro, rd, t0, ty, idx)


def _nearest_hit_bwd(one_side_planes, backend, res, g):
    """Cotangent of t through the winner recompute (t_of_winner), O(R):
    gathers the ONE winning primitive per ray and differentiates its
    closed-form intersector.  The discrete (ty, idx) choice is piecewise
    constant in the parameters, so detaching it is exact away from
    silhouettes — the same argument as the argmin itself.  Running this
    only here (not in the primal) keeps the forward render free of the
    recompute; the value is identical because the primal already returns
    the exact detached min."""
    scene, ro, rd, t0, ty, idx = res
    g_t = g[0]
    g_t = jnp.where(jnp.isfinite(t0), g_t, 0.0)

    def f(scene, ro, rd):
        t = t_of_winner(scene, ro, rd, ty, idx, one_side_planes, t0=t0)
        return jnp.where(jnp.isfinite(t), t, 0.0)

    _, vjp = jax.vjp(f, scene, ro, rd)
    return vjp(g_t)


_nearest_hit_diff.defvjp(_nearest_hit_fwd, _nearest_hit_bwd)


def nearest_hit(scene: Scene, ro, rd, one_side_planes=True, backend="auto"):
    """calcInter: → (t [R], type [R] int32, idx [R] int32).

    Misses report t = +inf, type = −1.

    The winner search (argmin over every primitive slot) runs detached —
    via the fused Pallas kernel when backend="pallas", else the batched jnp
    sweep ("auto" = pallas wherever Mosaic compiles, i.e. any non-CPU
    backend).  Differentiation goes through a custom VJP that recomputes
    the single winning primitive's t per ray (t_of_winner) — O(R) instead
    of O(R·P), and only materialised in the backward pass: a forward-only
    render never pays for it.
    """
    backend = resolve_backend(backend, ro)
    R = ro.shape[:-1]
    type_tab, _ = _type_tables(scene)
    if type_tab.shape[0] == 0:
        return (
            jnp.full(R, jnp.inf, ro.dtype),
            jnp.full(R, -1, jnp.int32),
            jnp.zeros(R, jnp.int32),
        )
    return _nearest_hit_diff(scene, ro, rd, one_side_planes, backend)


def _ring_shadow_alpha(textures, uv):
    """Ring texture alpha at the shadow-ray hit UV (rt.frag:643-651).
    Prefers the dedicated alpha-only table (texture.TextureSet
    .ring_alpha_packed — ~4x the gather throughput, bit-identical values);
    falls back to the full ring sampler."""
    rap = getattr(textures, "ring_alpha_packed", None)
    if rap is not None:
        from txr.render.texture import sample_packed

        # f32 quad rows, NOT u8: uint32 gathers measured ~60% slower than
        # f32 on v5e (scripts/gather_bench2.py: 5.98 vs 3.69 ms/512K), and
        # this table is ~1 MB either way
        k = jnp.zeros(uv.shape[:-1], jnp.int32)
        return sample_packed(rap, k, uv, None)[..., 0]
    from txr.render.texture import sample_ring_texture

    return sample_ring_texture(textures, uv)[..., 3]


def shadow_factor(scene: Scene, ro, rd, dist, textures=None, one_side_planes=True,
                  backend="auto"):
    """inShadow (rt.frag:630-658): any occluder with t < dist casts a full
    shadow (factor 1), except textured rings which attenuate by their
    texture alpha at the hit UV (rt.frag:643-651).  Spheres are tested
    non-hollow (rt.frag:636); one-sided planes don't occlude
    (rt.frag:652-655).

    ro, rd [R,3]; dist [R].  Returns shadow ∈ [0,1], [R].

    backend="pallas" (the "auto" choice off-CPU) runs the fused any-hit
    kernel: occlusion is an inherently piecewise-constant visibility term,
    and the ring-alpha attenuation keeps its texture-content gradient (the
    alpha fetch happens outside the kernel at the kernel's detached hit UV —
    only the measure-zero dependence of the UV itself on scene parameters is
    dropped relative to the jnp path).
    """
    from txr.utils.ablate import ablated

    if ablated("ringalpha"):
        textures = None          # rings occlude as opaque; no alpha fetch
    backend = resolve_backend(backend, ro)
    c = scene.counts
    R = ro.shape[:-1]

    if backend == "pallas" and ro.ndim == 2:
        from txr.kernels.pallas_intersect import shadow_sweep_pallas

        sg = jax.lax.stop_gradient
        solid_f, ring_hit, ring_uv = shadow_sweep_pallas(
            sg(scene), sg(ro), sg(rd), sg(dist), one_side_planes
        )
        shadow = solid_f
        if c["rings"]:
            r = scene.rings
            textured = r.texture > 0                     # [P]
            shadow = jnp.maximum(
                shadow, jnp.any(ring_hit & ~textured, axis=-1).astype(ro.dtype)
            )
            if textures is not None and textures.ring is not None:
                need = ring_hit & textured

                def alpha_fetch():
                    # block-compact the [R·L·nr] alpha gather to the lanes
                    # whose shadow ray actually hits a textured ring (this
                    # full-width fetch was a top backward cost, r4)
                    flat_need = need.reshape(-1)
                    flat_uv = ring_uv.reshape(-1, 2)
                    N = flat_need.shape[0]
                    from txr.render.fused import (_COMPACT_MIN_R,
                                                  _block_compact)

                    if N > _COMPACT_MIN_R:
                        a = _block_compact(
                            lambda uv_: _ring_shadow_alpha(textures, uv_),
                            flat_need, (flat_uv,), (), dist.dtype,
                            keep_frac=4)
                    else:
                        a = _ring_shadow_alpha(textures, flat_uv)
                    a = a.reshape(need.shape)
                    return jnp.sum(jnp.where(need, a, 0.0), axis=-1)

                alpha_sum = jax.lax.cond(      # the alpha fetch is a gather
                    jnp.any(need),
                    alpha_fetch,
                    lambda: jnp.zeros_like(dist),
                )
                shadow = shadow + alpha_sum
            else:
                shadow = jnp.maximum(
                    shadow, jnp.any(ring_hit & textured, axis=-1).astype(ro.dtype)
                )
        return jnp.minimum(shadow, 1.0)

    solid = jnp.zeros(R, bool)

    def occludes(t_rp):
        return jnp.any(t_rp < dist[..., None], axis=-1)

    if c["spheres"]:
        sp = scene.spheres
        solid |= occludes(
            gi.sphere_t(ro, rd, sp.pos, sp.radius, jnp.zeros(sp.pos.shape[0], bool))
        )
    if c["surfaces"]:
        s = scene.surfaces
        solid |= occludes(gi.surface_t(ro, rd, s.pos, s.quat, s.coef, s.v_min, s.v_max))
    if c["boxes"]:
        b = scene.boxes
        solid |= occludes(gi.box_t(ro, rd, b.pos, b.quat, b.form))
    if c["toruses"]:
        to = scene.toruses
        solid |= occludes(gi.torus_t(ro, rd, to.pos, to.quat, to.form))
    if not one_side_planes and c["planes"]:
        solid |= occludes(
            gi.plane_t(ro, rd, scene.planes.pos, scene.planes.normal, one_side_planes)
        )

    shadow = solid.astype(ro.dtype)

    if c["rings"]:
        r = scene.rings
        t_r = gi.ring_t(ro, rd, r.pos, r.quat, r.r1, r.r2)       # [R,P]
        hit_r = t_r < dist[..., None]
        textured = r.texture > 0
        # untextured ring hit = full shadow
        shadow = jnp.maximum(
            shadow, jnp.any(hit_r & ~textured, axis=-1).astype(ro.dtype)
        )
        if textures is not None and textures.ring is not None:
            # textured rings accumulate their texture alpha
            P = r.pos.shape[0]
            t_safe = jnp.where(hit_r, t_r, 0.0)
            uv = gi.ring_uv(
                ro[..., None, :], rd[..., None, :], t_safe,
                r.pos, r.quat, r.r1, r.r2,
            )  # [R,P,2]
            alpha = _ring_shadow_alpha(textures, uv)
            shadow = shadow + jnp.sum(
                jnp.where(hit_r & textured, alpha, 0.0), axis=-1
            )
        else:
            # textured ring but no texture data loaded → treat as opaque
            shadow = jnp.maximum(
                shadow, jnp.any(hit_r & textured, axis=-1).astype(ro.dtype)
            )

    return jnp.minimum(shadow, 1.0)
