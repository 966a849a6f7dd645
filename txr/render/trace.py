"""The bounce loop: rt.frag main() (rt.frag:804-902) as a masked lax loop.

TPU control-flow design: a fragment shader breaks out of its loop per pixel;
a TPU batch cannot.  Every ray runs the same fixed number of loop steps with
a per-ray ``alive`` mask — dead rays keep their state, and every state
update is a ``where`` on the masks.  The mask-accumulator rendering equation
is the reference's own (color += contribution · mask, rt.frag:812-813), so
it maps 1:1.

Iteration budget: the GLSL loop runs ITERATIIONS (= reflect_depth = 5) hits,
but a refraction event does NOT consume an iteration (the `i--` at
rt.frag:870-872).  Here each ray carries a bounce counter that refractive
hits don't increment; the static loop length is
``iterations + extra_refraction_steps`` so every ray can spend its full
budget even after several refraction events.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from txr.geometry import intersect as gi
from txr.geometry import quaternion as quat
from txr.render import texture as tx
from txr.render.intersect import nearest_hit, MAX_DIST
from txr.utils.gather import small_take
from txr.render.shading import (
    calc_shade,
    fresnel_reflect_amount,
    fresnel_schlick,
    reflect,
    refract,
)
from txr.scene.types import (
    TYPE_SPHERE,
    TYPE_PLANE,
    TYPE_SURFACE,
    TYPE_BOX,
    TYPE_TORUS,
    TYPE_RING,
    TYPE_POINT_LIGHT,
)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render options — the TPU analog of the reference's GLSL
    feature #defines (rt.frag:15-22) and template defines (rt.frag:122-132).
    Hashable → usable as a jit static argument; flipping a flag retraces,
    exactly like editing a #define recompiled the shader."""

    width: int = 1280
    height: int = 720
    iterations: int = 5               # reflect_depth, SceneManager.cpp:233
    supersample: int = 1              # SSAA factor (replaces SMAA)
    # Budget for the i-- refraction steps (rt.frag:870-872): the static
    # loop length is iterations + this.  6 = auto_refraction_steps' cap
    # (three glass entry/exit pairs) — the measured live-ray distribution
    # on the demo scene dies out well before that.  Rays that refract more
    # times than the budget keep their accumulated colour and drop the
    # tail contribution, exactly like a ray still alive when the
    # reference's loop ends (rt.frag:821); see test_refraction_budget.
    extra_refraction_steps: int = 6
    shadow_enabled: bool = True       # SHADOW_ENABLED, rt.frag:15
    do_fresnel: bool = True           # DO_FRESNEL, rt.frag:20
    total_internal_reflection: bool = True  # rt.frag:19
    plane_oneside: bool = True        # PLANE_ONESIDE, rt.frag:21
    reflect_reduce_iteration: bool = True   # rt.frag:22
    # Winner-search backend for nearest_hit: "jnp" (XLA-fused sweep),
    # "pallas" (fused VMEM-tiled kernel), or "auto" (pallas on TPU, jnp on
    # CPU — measured 8x sweep speedup on v5e).  The differentiable path is
    # the same winner-recompute either way.
    backend: str = "auto"
    # Rays per sequential chunk (0 = whole batch at once).  Chunking bounds
    # the peak [rays × primitives] working set: the flat ray batch is
    # processed by a lax.map over chunks, so HBM holds one chunk's
    # intermediates at a time.  Powers of two aligned to the 8×128 VPU tile
    # (e.g. 262144) keep layouts clean.
    ray_chunk: int = 0
    # Rematerialise each bounce in the backward pass: saves only the loop
    # carry per bounce instead of every intermediate (the [R, P] intersect
    # arrays), trading ~2x forward FLOPs inside the backward for O(R) memory.
    # Essential at 1080p+ on a 16GB chip.
    remat: bool = True
    # Mip/LOD texturing: build 2×2 box-filtered mip pyramids and sample
    # trilinearly at the ray-footprint LOD (texture.py module doc) — the
    # replacement for the reference's fwidth→textureLod path
    # (rt.frag:319-340) and load-time glGenerateMipmap (GLWrapper.cpp:343).
    texture_lod: bool = True
    # Dead-work gating: wrap the per-step body, the glossy pass, the miss
    # cubemap fetch, and every texture fetch in lax.cond on "any ray needs
    # it".  Saves most of the frame on real scenes (sky chunks, refraction
    # tail steps); turn off to get the lean straight-line program (smaller
    # HLO, faster XLA compile) for compile-time-sensitive contexts.
    gating: bool = True
    # Fused whole-step Pallas kernel (txr/kernels/pallas_step.py): ONE
    # kernel per bounce step computes the nearest-hit sweep, hit info,
    # materials, Fresnel, and per-light shading probes incl. the shadow
    # sweeps, leaving XLA only the texture gather and the elementwise state
    # update — the TPU analog of the reference's single fused fragment
    # program (rt.frag:804-902).  "auto" = on whenever the sweep backend
    # resolves to pallas (off-CPU, outside shard_map); "on"/"off" force.
    # Gradients always go through the jnp body (custom VJP recompute).
    fused: str = "auto"
    # u8-packed unified texture fetch in the jnp body (hit_info): 4× smaller
    # table → small-table gather rate, plus block compaction.  Fully
    # differentiable: sample_atlas routes the u8 fetch through a custom VJP
    # (u8 primal, f32-atlas linearisation for the content cotangent), so
    # uv/lod/scene AND texture-content gradients all flow (ADVICE r4).
    # The f64 oracle stays within the golden tolerance either way (u8 and
    # f32 atlases store identical quantized values).  False = plain f32
    # gathers end-to-end (the diffing reference path).
    fast_texels: bool = True
    # Backward-pass route for the fused path: "loop" = the hand-rolled
    # loop VJP (_traced_loop — explicit per-step saves, hand-gated and
    # tier-compacted reverse scan; the fast path), "scan" = the generic
    # jax.checkpoint + scan-transpose route (the diffing reference).  The
    # jnp/CPU body always uses the generic route.
    bwd: str = "loop"
    # Static switch for the refractive-glossy extra pass
    # (getReflectedColor, rt.frag:787-802).  It costs a full nearest-hit +
    # shade per bounce, so scenes with no refractive+reflective material
    # should disable it (the reference pays the cost only on rays that take
    # the branch; a masked TPU batch pays it for everyone).
    refractive_glossy: bool = True

    # Antialiasing mode: "edge" re-renders ONLY edge pixels at
    # supersample², the TPU-first answer to SMAA's edges-only cost model
    # (SMAA detects luma edges and blends only there, SMAA.h:689,1252;
    # brute SSAA pays k²× everywhere).  "ssaa" is the uniform box filter.
    # Both are differentiable; the edge MASK is detached (piecewise
    # constant, the argmin argument).
    aa_mode: str = "edge"
    # luma edge-detect threshold (SMAA_THRESHOLD; ULTRA uses 0.05,
    # SMAA.h:319-323 — 0.02 measured to recover uniform-SSAA PSNR)
    edge_threshold: float = 0.02
    # static budget: at most edge_budget_mult·(H+W) pixels re-render (edges
    # scale with silhouette LENGTH, not area).  20·(H+W) at 1080p = 60K
    # pixels → ultra (k=4) costs ≤1.46× the 1-spp frame by construction;
    # at test resolutions the budget covers every pixel.  Edges beyond the
    # budget keep their 1-spp value.
    edge_budget_mult: int = 20

    @property
    def max_steps(self):
        if self.reflect_reduce_iteration:
            return self.iterations + self.extra_refraction_steps
        return self.iterations

    def with_aa_preset(self, preset: str, mode: str = "edge") -> "RenderConfig":
        """Quality presets mirroring the reference's SMAA_PRESET_{LOW,MEDIUM,
        HIGH,ULTRA} (SMAA_Builder.h:9-12, SMAA.h:304-323), mapped to the
        sub-sample factor k.  mode="edge" (default): 1-spp frame + k²-spp
        re-render of luma-edge pixels only — SMAA's cost model with SSAA's
        quality.  mode="ssaa": uniform k× supersampling."""
        return dataclasses.replace(
            self, supersample=AA_PRESETS[preset.lower()], aa_mode=mode)


# SMAA preset → supersampling factor.  "low" = no AA (SMAA LOW barely
# thresholds); "ultra" = 4×4 box filter, the strongest practical SSAA.
AA_PRESETS = {"off": 1, "low": 1, "medium": 2, "high": 3, "ultra": 4}


def auto_refraction_steps(scene, cap: int = 6) -> int:
    """Scene-derived static budget for the refraction ``i--`` extension
    steps (rt.frag:870-872).  A refraction event does not consume a bounce,
    so the static loop length must cover iterations + the worst-case number
    of refraction events — but a scene with NO refractive material can
    never take the branch, and pays zero extra steps.

    Call OUTSIDE jit (reads concrete material values) when building the
    RenderConfig, e.g.::

        cfg = dataclasses.replace(cfg, extra_refraction_steps=
                                  auto_refraction_steps(scene))

    ``cap`` bounds scenes that do refract: each glass traversal costs an
    entry+exit pair, and the measured live-ray distribution on the demo
    scene dies out well before 6 extension steps (scripts/
    profile_breakdown.py records it each round).
    """
    import numpy as np

    for g in (scene.spheres, scene.planes, scene.surfaces, scene.boxes,
              scene.toruses, scene.rings):
        if g.mat.refract.shape[0] and bool(np.any(np.asarray(g.mat.refract) > 0)):
            return cap
    return 0


def hit_info(scene, textures, ro, rd, t, ty, idx, pix_angle=None, gate=True,
             miss=None, fast=False):
    """get_hit_info (rt.frag:744-784): per-ray normal, material (with
    texturing applied to the colour), alpha, and the distance-scaled
    shadow-acne bias.

    Each primitive type's info is recomputed only per-ray (cheap [R]-sized
    gathers) and blended by the type mask — the TPU version of the GLSL
    if-chain.

    ``pix_angle`` (radians per sample, 1/(height·ss)) enables ray-footprint
    mip LOD for the texture fetches; None = level-0 bilinear.

    ``miss`` ([R] bool or None): when the scene atlas carries the cubemap
    (SceneAtlas.cube_base), rays flagged here get their environment colour
    fetched in the SAME pass as the textured-hit fetch (returned as
    ``env``) — one gather pass per bounce step instead of two.

    ``fast`` (cfg.fast_texels): the unified fetch gathers the u8-packed
    atlas (4× smaller table, small-table gather rate) and block-compacts to
    the lanes that request texels.  All gradients (uv/lod/scene and
    texture content) flow — sample_atlas wraps the u8 fetch in a custom
    VJP that linearises content through the f32 atlas.
    """
    R = t.shape
    dt = ro.dtype
    c = scene.counts

    n_out = jnp.zeros(R + (3,), dt)
    color = jnp.zeros(R + (3,), dt)
    absorb = jnp.zeros(R + (3,), dt)
    diffuse = jnp.zeros(R, dt)
    reflection = jnp.zeros(R, dt)
    refraction = jnp.zeros(R, dt)
    specular = jnp.zeros(R, dt)
    kd = jnp.zeros(R, dt)
    ks = jnp.zeros(R, dt)
    alpha = jnp.ones(R, dt)

    t_safe = jnp.where(jnp.isfinite(t), t, 0.0)
    pt = ro + rd * t_safe[..., None]

    def fw_of(n):
        """Ray-footprint width at the hit for LOD (None when LOD is off)."""
        if pix_angle is None:
            return None
        cos_in = jnp.abs(jnp.sum(rd * n, axis=-1))
        return tx.footprint_world(t_safe, cos_in, pix_angle)

    def blend(sel, mat, i, n, a=None, col_override=None):
        nonlocal n_out, color, absorb, diffuse, reflection, refraction
        nonlocal specular, kd, ks, alpha
        s1 = sel[..., None]
        n_out = jnp.where(s1, n, n_out)
        col = small_take(mat.color, i) if col_override is None else col_override
        color = jnp.where(s1, col, color)
        absorb = jnp.where(s1, small_take(mat.absorb, i), absorb)
        diffuse = jnp.where(sel, small_take(mat.diffuse, i), diffuse)
        reflection = jnp.where(sel, small_take(mat.reflect, i), reflection)
        refraction = jnp.where(sel, small_take(mat.refract, i), refraction)
        specular = jnp.where(sel, small_take(mat.specular, i), specular)
        kd = jnp.where(sel, small_take(mat.kd, i), kd)
        ks = jnp.where(sel, small_take(mat.ks, i), ks)
        if a is not None:
            alpha = jnp.where(sel, a, alpha)

    def gated_fetch(need, fetch):
        """Texture fetches cost gathers (the scarce resource on TPU); skip
        the whole fetch when no ray in the batch lands on that textured
        type this step — the reference pays per-fragment, a masked batch
        would pay for everyone.  The skip value derives from a varying
        input (not a fresh constant) so both cond branches carry the same
        device-varying type under shard_map."""
        if not gate:
            return fetch()
        ones = jnp.broadcast_to(jnp.ones_like(t_safe)[..., None], R + (4,))
        return jax.lax.cond(jnp.any(need), fetch, lambda: ones)

    # -- unified texture request ------------------------------------------
    # With the SceneAtlas (texture.py), every textured hit type contributes
    # (slot, uv, lod) per ray and a SINGLE fetch serves them all — including
    # (when the cubemap shares the atlas) the environment colour of ``miss``
    # rays.  The per-type sampler fallbacks below handle unpacked
    # TextureSets.
    sa = textures.atlas2d
    if sa is not None:
        req_k = jnp.zeros(R, jnp.int32)
        req_u = jnp.zeros(R, dt)
        req_v = jnp.zeros(R, dt)
        req_lod = None if pix_angle is None else jnp.zeros(R, dt)
        req_any = jnp.zeros(R, bool)
    sphere_textured = box_textured = ring_textured = None
    env_sel = None
    if (
        sa is not None
        and getattr(sa, "cube_base", None) is not None
        and miss is not None
    ):
        env_sel = miss
        face, uvc = tx._cube_face_uv(rd)
        req_k = jnp.where(env_sel, sa.cube_base + face, req_k)
        req_u = jnp.where(env_sel, uvc[..., 0], req_u)
        req_v = jnp.where(env_sel, uvc[..., 1], req_v)
        # cubemap has no mips (load_cubemap builds none, GLWrapper.cpp:284)
        if req_lod is not None:
            req_lod = jnp.where(env_sel, 0.0, req_lod)
        req_any = req_any | env_sel
    box_w = None

    if c["spheres"]:
        sp = scene.spheres
        i = jnp.clip(idx, 0, c["spheres"] - 1)
        sel = ty == TYPE_SPHERE
        n = gi.sphere_normal(pt, small_take(sp.pos, i))
        col, a = None, None
        if sa is not None and sa.n_sphere:
            tex_num = small_take(sp.texture, i)
            radius = small_take(sp.radius, i)
            sphere_textured = sel & (tex_num > 0)
            k = jnp.clip(tex_num - 1, 0, sa.n_sphere - 1)
            # getSphereTexture rotates the normal by the sphere quat first
            # (rt.frag:320-322)
            uvs = tx.sphere_uv(quat.rotate(small_take(sp.quat, i), n))
            req_k = jnp.where(sphere_textured, k, req_k)
            req_u = jnp.where(sphere_textured, uvs[..., 0], req_u)
            req_v = jnp.where(sphere_textured, uvs[..., 1], req_v)
            if req_lod is not None:
                _, h0, w0, _ = tx._meta(sa.pa, k)
                lod = tx.lod_sphere(fw_of(n), radius, (h0, w0))
                req_lod = jnp.where(sphere_textured, lod, req_lod)
            req_any = req_any | sphere_textured
        elif len(textures.sphere):
            tex_num = small_take(sp.texture, i)
            radius = small_take(sp.radius, i)
            textured = tex_num > 0

            def fetch_sphere(n=n, tex_num=tex_num, radius=radius):
                return tx.sample_sphere_texture(
                    textures, tex_num, quat.rotate(small_take(sp.quat, i), n),
                    fw_of(n), radius,
                )

            texc = gated_fetch(sel & textured, fetch_sphere)
            col = jnp.where(textured[..., None], texc[..., :3],
                            small_take(sp.mat.color, i))
            a = jnp.where(textured, texc[..., 3], 1.0)
        blend(sel, sp.mat, i, n, a, col)

    if c["planes"]:
        pl = scene.planes
        i = jnp.clip(idx, 0, c["planes"] - 1)
        nrm = small_take(pl.normal, i)
        n = gi.safe_normalize(nrm)
        blend(ty == TYPE_PLANE, pl.mat, i, n)

    if c["surfaces"]:
        su = scene.surfaces
        i = jnp.clip(idx, 0, c["surfaces"] - 1)
        n = gi.surface_normal(ro, rd, t_safe, small_take(su.pos, i),
                              small_take(su.quat, i), small_take(su.coef, i))
        blend(ty == TYPE_SURFACE, su.mat, i, n)

    if c["boxes"]:
        bx = scene.boxes
        i = jnp.clip(idx, 0, c["boxes"] - 1)
        sel = ty == TYPE_BOX
        bpos = small_take(bx.pos, i)
        bquat = small_take(bx.quat, i)
        n = gi.box_normal(ro, rd, bpos, bquat, small_take(bx.form, i))
        col = None
        if sa is not None and sa.box_slot is not None:
            box_textured = sel & (small_take(bx.texture, i) > 0)
            uvb, box_w = tx.box_face_uv(pt, n, bpos, bquat)
            req_k = jnp.where(box_textured, sa.box_slot, req_k)
            req_u = jnp.where(box_textured, uvb[..., 0], req_u)
            req_v = jnp.where(box_textured, uvb[..., 1], req_v)
            if req_lod is not None:
                lod = tx.lod_box(fw_of(n), textures.box.shape[:2])
                req_lod = jnp.where(box_textured, lod, req_lod)
            req_any = req_any | box_textured
        elif textures.box is not None:
            textured = small_take(bx.texture, i) > 0

            def fetch_box(n=n, bpos=bpos, bquat=bquat):
                return tx.sample_box_texture(textures, pt, n, bpos, bquat, fw_of(n))

            texc = gated_fetch(sel & textured, fetch_box)
            col = jnp.where(textured[..., None],
                            texc[..., :3], small_take(bx.mat.color, i))
        blend(sel, bx.mat, i, n, None, col)

    if c["toruses"]:
        to = scene.toruses
        i = jnp.clip(idx, 0, c["toruses"] - 1)
        n = gi.torus_normal(ro, rd, t_safe, small_take(to.pos, i),
                            small_take(to.quat, i), small_take(to.form, i))
        blend(ty == TYPE_TORUS, to.mat, i, n)

    if c["rings"]:
        ri = scene.rings
        i = jnp.clip(idx, 0, c["rings"] - 1)
        sel = ty == TYPE_RING
        rquat = small_take(ri.quat, i)
        n = gi.ring_normal(rquat)
        col, a = None, None
        if sa is not None and sa.ring_slot is not None:
            r1 = small_take(ri.r1, i)
            r2 = small_take(ri.r2, i)
            ring_textured = sel & (small_take(ri.texture, i) > 0)
            uvr = gi.ring_uv(ro, rd, t_safe, small_take(ri.pos, i), rquat, r1, r2)
            req_k = jnp.where(ring_textured, sa.ring_slot, req_k)
            req_u = jnp.where(ring_textured, uvr[..., 0], req_u)
            req_v = jnp.where(ring_textured, uvr[..., 1], req_v)
            if req_lod is not None:
                lod = tx.lod_ring(fw_of(n), r1, r2, textures.ring.shape[:2])
                req_lod = jnp.where(ring_textured, lod, req_lod)
            req_any = req_any | ring_textured
        elif textures.ring is not None:
            r1 = small_take(ri.r1, i)
            r2 = small_take(ri.r2, i)
            textured = small_take(ri.texture, i) > 0

            def fetch_ring(n=n, rquat=rquat, r1=r1, r2=r2):
                uv = gi.ring_uv(ro, rd, t_safe, small_take(ri.pos, i), rquat, r1, r2)
                return tx.sample_ring_texture(textures, uv, fw_of(n), r1, r2)

            texc = gated_fetch(sel & textured, fetch_ring)
            col = jnp.where(textured[..., None], texc[..., :3],
                            small_take(ri.mat.color, i))
            a = jnp.where(textured, texc[..., 3], 1.0)
        blend(sel, ri.mat, i, n, a, col)

    # -- the single unified fetch (then per-type colour/alpha overrides) ----
    from txr.utils.ablate import ablated

    env = None
    if ablated("hitfetch"):
        sphere_textured = box_textured = ring_textured = env_sel = None
    if sa is not None and (
        sphere_textured is not None
        or box_textured is not None
        or ring_textured is not None
        or env_sel is not None
    ):
        uv = jnp.stack([req_u, req_v], axis=-1)
        use_u8 = fast and getattr(sa.pa, "qatlas_u8", None) is not None

        def unified_fetch():
            if req_lod is None:
                sample = lambda k_, uv_: tx.sample_atlas(
                    sa.pa, k_, uv_, None, use_u8=use_u8)
                args = (req_k, uv)
            else:
                sample = lambda k_, uv_, l_: tx.sample_atlas(
                    sa.pa, k_, uv_, l_, use_u8=use_u8)
                args = (req_k, uv, req_lod)
            from txr.render.fused import _block_compact, _COMPACT_MIN_R

            if req_any.ndim == 1 and req_any.shape[0] > _COMPACT_MIN_R:
                return _block_compact(sample, req_any, args, (4,), dt,
                                      keep_frac=2)
            return sample(*args)

        texc = gated_fetch(req_any, unified_fetch)
        if sphere_textured is not None:
            color = jnp.where(sphere_textured[..., None], texc[..., :3], color)
            alpha = jnp.where(sphere_textured, texc[..., 3], alpha)
        if box_textured is not None:
            color = jnp.where(
                box_textured[..., None], texc[..., :3] * box_w[..., None], color
            )
        if ring_textured is not None:
            color = jnp.where(ring_textured[..., None], texc[..., :3], color)
            alpha = jnp.where(ring_textured, texc[..., 3], alpha)
        if env_sel is not None:
            env = texc[..., :3]

    bias = (9e-3 * t_safe + 35.0) / 35e3  # rt.frag:780-782

    return dict(
        env=env,
        pt=pt,
        normal=n_out,
        color=color,
        absorb=absorb,
        diffuse=diffuse,
        reflection=reflection,
        refraction=refraction,
        specular=specular,
        kd=kd,
        ks=ks,
        alpha=alpha,
        bias=bias,
    )


def _background(scene, textures, rd):
    sa = textures.atlas2d
    if sa is not None and getattr(sa, "cube_base", None) is not None:
        face, uv = tx._cube_face_uv(rd)
        return tx.sample_atlas(sa.pa, sa.cube_base + face, uv, None)[..., :3]
    if textures.cubemap_packed is not None:
        return tx.sample_cubemap_packed(textures.cubemap_packed, rd)
    if textures.cubemap is not None:
        return tx.sample_cubemap(textures.cubemap, rd)
    return jnp.broadcast_to(scene.bg_color, rd.shape)


def _pix_angle(cfg):
    """Radians subtended by one sample: raygen normalizes by height
    (rt.frag:313-317), so sample spacing ≈ 1/(h·ss)."""
    return 1.0 / (cfg.height * cfg.supersample) if cfg.texture_lod else None


def _reflected_color(scene, textures, cfg, ro, rd):
    """getReflectedColor (rt.frag:787-802): ONE extra nearest-hit + shade
    for the glossy component of refractive surfaces (not recursive)."""
    t, ty, idx = nearest_hit(scene, ro, rd, cfg.plane_oneside, cfg.backend)
    hi = hit_info(scene, textures, ro, rd, t, ty, idx, _pix_angle(cfg),
                  gate=cfg.gating, fast=cfg.fast_texels)
    is_light = ty == TYPE_POINT_LIGHT
    hit = jnp.isfinite(t) & (ty >= 0) & ~is_light

    n = hi["normal"]
    facing = jnp.sum(rd * n, axis=-1) < 0
    ro2 = jnp.where(
        facing[..., None],
        hi["pt"] + n * hi["bias"][..., None],
        hi["pt"] - n * hi["bias"][..., None],
    )
    shade = calc_shade(
        scene, textures, ro2, rd,
        hi["color"], hi["diffuse"], hi["specular"], hi["kd"], hi["ks"],
        n, True, cfg.shadow_enabled, cfg.plane_oneside, cfg.backend,
    )
    color = jnp.where(hit[..., None], shade, 0.0)
    if scene.counts["lights_point"]:
        lcol = small_take(scene.lights_point.color,
                          jnp.clip(idx, 0, scene.counts["lights_point"] - 1))
        color = jnp.where(is_light[..., None], lcol, color)
    return color


def initial_state(ro, rd):
    """Loop carry for the bounce loop.  Derived from the ray arrays (not
    fresh constants) so the values inherit the rays' device-varying sharding
    under shard_map — otherwise the loop carry would be replicated-in/
    varying-out, which the shard_map VMA check rejects."""
    zero = ro[..., 0] * 0.0
    return dict(
        ro=ro,
        rd=rd,
        color=ro * 0.0,
        mask=ro * 0.0 + 1.0,
        absorb_dist=zero,
        bounces=zero.astype(jnp.int32),    # the GLSL `i`
        alive=zero == 0.0,
        # deferred environment: a ray misses at most once (it dies, and a
        # dead ray's rd/mask never change again — every update is gated on
        # alive), so ONE bit records the miss and the post-loop env pass
        # reconstructs the cubemap term as missed·mask·bg(rd).  This keeps
        # the loop carry at 16 packed floats (pack_state) — carry width is
        # what every cond/compaction boundary copies (PROFILE r4).
        missed=zero != 0.0,
    )


# packed-carry layout: the bounce state as ONE [R, 16] f32 array.  Every
# lax.cond boundary (step gate, compaction tiers) and every compaction
# gather/scatter then moves a single well-tiled array instead of 13 — the
# r4 profile showed the 13-array carry's per-cond copies/layout conversions
# dominating the frame.
_PACK_COLS = 16


def pack_state(st):
    """dict carry → [R, 16] f32 (cols: ro 0-2, rd 3-5, color 6-8, mask
    9-11, absorb_dist 12, bounces 13, alive 14, missed 15).  Exact: small
    ints and 0/1 flags round-trip through f32."""
    R = st["absorb_dist"].shape[0]
    dt = st["ro"].dtype
    return jnp.concatenate(
        [
            st["ro"], st["rd"], st["color"], st["mask"],
            st["absorb_dist"][:, None],
            st["bounces"].astype(dt)[:, None],
            st["alive"].astype(dt)[:, None],
            st["missed"].astype(dt)[:, None],
        ],
        axis=1,
    )


def unpack_state(arr):
    return dict(
        ro=arr[:, 0:3],
        rd=arr[:, 3:6],
        color=arr[:, 6:9],
        mask=arr[:, 9:12],
        absorb_dist=arr[:, 12],
        bounces=arr[:, 13].astype(jnp.int32),
        alive=arr[:, 14] > 0.5,
        missed=arr[:, 15] > 0.5,
    )


def step_jnp(scene, textures, cfg: RenderConfig, st, saved=None):
    """One bounce-loop step, jnp form: the differentiable reference body
    (also the CPU path and the recompute target of the fused step's VJP).

    ``saved`` (fused.saves_of_prf or None): the forward probe's detached
    sweep winner + shadow any-hit results.  When present, the body skips
    every O(R·P) sweep: t comes from the O(R) winner recompute
    (nearest_hit_saved) and the shadow factor from the saved probes — the
    backward-pass form (_fused_step_bwd).  Gradients are identical because
    the skipped quantities are piecewise constant in the parameters."""
    has_lights = scene.counts["lights_point"] > 0

    def body(st):
        ro, rd = st["ro"], st["rd"]
        alive = st["alive"]
        color, mask = st["color"], st["mask"]
        absorb_dist = st["absorb_dist"]
        bounces = st["bounces"]

        if saved is None:
            t, ty, idx = nearest_hit(scene, ro, rd, cfg.plane_oneside,
                                     cfg.backend)
        else:
            from txr.render.intersect import nearest_hit_saved

            t, ty, idx = nearest_hit_saved(scene, ro, rd, saved["slot"],
                                           saved["t"], cfg.plane_oneside)
        hit = jnp.isfinite(t)
        act = alive & hit

        # -- miss → environment (rt.frag:892-895), DEFERRED: one bit marks
        # the miss; the dead ray's rd/mask freeze, so the single post-loop
        # env fetch (trace()) reconstructs missed·mask·bg(rd) exactly.
        miss = alive & ~hit
        st_missed = st["missed"] | miss
        alive = alive & hit

        # -- light bulb hit (rt.frag:829-832)
        if has_lights:
            is_light = act & (ty == TYPE_POINT_LIGHT)
            lcol = small_take(
                scene.lights_point.color,
                jnp.clip(idx, 0, scene.counts["lights_point"] - 1),
            )
            color = jnp.where(is_light[..., None], color + lcol * mask, color)
            alive = alive & ~is_light
            act = act & ~is_light

        hi = hit_info(scene, textures, ro, rd, t, ty, idx, _pix_angle(cfg),
                      gate=cfg.gating, fast=cfg.fast_texels)
        n = hi["normal"]
        outside = jnp.sum(rd * n, axis=-1) < 0.0     # rt.frag:837
        n = jnp.where(outside[..., None], n, -n)
        pt = hi["pt"]
        bias = hi["bias"][..., None]

        refr_idx = hi["refraction"]
        refl = hi["reflection"]
        is_refractive = refr_idx > 0.0

        # -- Fresnel split (rt.frag:840-849)
        if cfg.total_internal_reflection:
            n1 = jnp.where(outside, 1.0, refr_idx)
            n2 = jnp.where(outside, refr_idx, 1.0)
            rm_refr = fresnel_reflect_amount(n1, n2, rd, n, refl, cfg.do_fresnel)
            reflect_mult = jnp.where(
                is_refractive, rm_refr, fresnel_schlick(n, rd, refl)
            )
        else:
            reflect_mult = fresnel_schlick(n, rd, refl)
        refract_mult = 1.0 - reflect_mult

        shade_origin_out = pt + n * bias
        shade_origin_in = pt - n * bias

        # ---- refractive branch (rt.frag:851-873) -------------------------
        refr_act = act & is_refractive
        glossy = refr_act & outside & (refl > 0.0)
        if cfg.refractive_glossy:
            # The reference pays getReflectedColor only on fragments that
            # take the branch (rt.frag:851-855); a masked TPU batch would
            # pay its full nearest-hit + shade for everyone, so gate the
            # whole pass on "any ray needs it" AND block-compact to the
            # glossy lanes (rare — this pass full-width was ~190 ms of the
            # r4 backward, where this body is the VJP recompute).
            ro_g = shade_origin_out
            rd_g = reflect(rd, n)

            def _rc():
                R = glossy.shape[0] if glossy.ndim == 1 else 0
                from txr.render.fused import _COMPACT_MIN_R, _block_compact

                if R > _COMPACT_MIN_R:
                    return _block_compact(
                        lambda o, d: _reflected_color(
                            scene, textures, cfg, o, d),
                        glossy, (ro_g, rd_g), (3,), ro_g.dtype, keep_frac=8)
                return _reflected_color(scene, textures, cfg, ro_g, rd_g)

            def glossy_pass(cm):
                color, mask = cm
                rc = _rc()
                color = jnp.where(
                    glossy[..., None],
                    color + rc * reflect_mult[..., None] * mask,
                    color,
                )
                mask = jnp.where(
                    glossy[..., None], mask * refract_mult[..., None], mask
                )
                return color, mask

            if cfg.gating:
                color, mask = jax.lax.cond(
                    jnp.any(glossy), glossy_pass, lambda cm: cm, (color, mask)
                )
            else:
                color, mask = glossy_pass((color, mask))

        inside = refr_act & ~outside
        absorb_dist = jnp.where(inside, absorb_dist + t, absorb_dist)
        beer = jnp.exp(-hi["absorb"] * absorb_dist[..., None])
        mask = jnp.where(inside[..., None], mask * beer, mask)

        if cfg.total_internal_reflection:
            tir = refr_act & (reflect_mult >= 1.0)   # rt.frag:865-866
            alive = alive & ~tir
            refr_act = refr_act & ~tir

        eta = jnp.where(outside, 1.0 / jnp.maximum(refr_idx, 1e-6), refr_idx)
        new_rd_refr = refract(rd, n, eta)
        ro = jnp.where(refr_act[..., None], shade_origin_in, ro)
        rd = jnp.where(refr_act[..., None], new_rd_refr, rd)

        # ---- reflective branch (rt.frag:874-880) -------------------------
        refl_act = act & ~is_refractive & (refl > 0.0)
        # ---- diffuse branch (rt.frag:881-890) ----------------------------
        diff_act = act & ~is_refractive & (refl <= 0.0)

        needs_shade = refl_act | diff_act
        shadow_saved = None
        if saved is not None and cfg.shadow_enabled:
            from txr.render.fused import shadow_from_probes

            shadow_saved = shadow_from_probes(
                scene, textures, cfg, saved["light_solid"],
                saved["ring_hit"], saved["ring_uv"])
        shade = calc_shade(
            scene, textures, shade_origin_out, rd,
            hi["color"], hi["diffuse"], hi["specular"], hi["kd"], hi["ks"],
            n, True, cfg.shadow_enabled, cfg.plane_oneside, cfg.backend,
            shadow_saved=shadow_saved,
        )
        shade = jnp.where(needs_shade[..., None], shade, 0.0)

        color = jnp.where(
            refl_act[..., None],
            color + shade * refract_mult[..., None] * mask,
            color,
        )
        new_rd_refl = reflect(rd, n)
        ro = jnp.where(refl_act[..., None], shade_origin_out, ro)
        rd = jnp.where(refl_act[..., None], new_rd_refl, rd)
        mask = jnp.where(refl_act[..., None], mask * reflect_mult[..., None], mask)

        alpha = hi["alpha"]
        color = jnp.where(
            diff_act[..., None], color + shade * mask * alpha[..., None], color
        )
        translucent = diff_act & (alpha < 1.0)
        ro = jnp.where(translucent[..., None], shade_origin_in, ro)
        mask = jnp.where(translucent[..., None], mask * (1.0 - alpha[..., None]), mask)
        alive = alive & ~(diff_act & (alpha >= 1.0))

        # ---- iteration accounting (the GLSL i-- at rt.frag:870-872) ------
        if cfg.reflect_reduce_iteration:
            consumed = act & ~refr_act
        else:
            consumed = act
        bounces = jnp.where(consumed, bounces + 1, bounces)
        alive = alive & (bounces < cfg.iterations)

        return dict(
            ro=ro, rd=rd, color=color, mask=mask,
            absorb_dist=absorb_dist, bounces=bounces, alive=alive,
            missed=st_missed,
        )

    return body(st)


def _use_fused(scene, cfg: RenderConfig, ro) -> bool:
    """Fused Pallas step: "auto" = whenever the sweep backend resolves to
    pallas (i.e. off-CPU) outside shard_map; "on" forces it (tests use tiny
    CPU interpret-mode runs to validate parity); "off" disables."""
    if cfg.fused == "off":
        return False
    if getattr(jax.typeof(ro), "vma", None) and jax.default_backend() == "cpu":
        return False          # CPU interpret-mode tile: jnp body per device
    c = scene.counts
    if sum(c[k] for k in ("planes", "spheres", "surfaces", "boxes",
                          "toruses", "rings", "lights_point")) == 0:
        return False          # degenerate kernel; jnp path is trivial anyway
    from txr.render.intersect import resolve_backend

    if cfg.fused == "on":
        return True
    return resolve_backend(cfg.backend, ro) == "pallas"


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_step(cfg, metas, scene, textures, st, p_save, p_rest):
    from txr.render.fused import fused_step_fwd, unpack_pr

    m_save, m_rest = metas
    # save-pack fields win the merge (both unpacks default ring_* to None)
    pr = {**unpack_pr(p_rest, m_rest), **unpack_pr(p_save, m_save)}
    return fused_step_fwd(scene, textures, cfg, st, pr=pr)


def _fused_step_fwd(cfg, metas, scene, textures, st, p_save, p_rest):
    # symbolic_zeros=True: every pytree LEAF arrives as a CustomVJPPrimal
    # (.value, .perturbed).  The perturbed bits are trace-time constants, so
    # which cotangents the backward must produce is STATIC — encoded into
    # the residual pytree structure (empty tuples carry no arrays).  The r5
    # profile showed the unconditional 3-arg vjp spending ~130 ms/frame on
    # atlas-sized texture cotangents that jax.grad(loss)(scene) then threw
    # away: scatter-adds into the 25 MB f32 atlas and its accumulation
    # across 11 steps × 8 chunks of the scan transpose.
    val = lambda t: jax.tree.map(lambda l: l.value, t)
    pert = lambda t: any(l.perturbed for l in jax.tree.leaves(t))
    flags = (((),) if pert(scene) else (), ((),) if pert(textures) else ())
    scene_v, tex_v, st_v = val(scene), val(textures), val(st)
    p_save_v = val(p_save)
    # residuals hold ONLY the save pack: the rest pack feeds the forward
    # consume alone, so the remat recompute DCEs it together with the probe
    return (_fused_step(cfg, metas, scene_v, tex_v, st_v, p_save_v,
                        val(p_rest)),
            (scene_v, tex_v, st_v, p_save_v, flags))


def _instantiate_ct(ct):
    """Materialise a SymbolicZero output cotangent so jax.vjp accepts it:
    float0 for int/bool primal outputs, dense zeros for the (rare) float
    output whose cotangent is symbolically zero."""
    from jax.custom_derivatives import SymbolicZero

    if isinstance(ct, SymbolicZero):
        import numpy as np

        if ct.aval.dtype == jax.dtypes.float0:
            return np.zeros(ct.aval.shape, jax.dtypes.float0)
        return jnp.zeros(ct.aval.shape, ct.aval.dtype)
    return ct


def _fused_step_bwd(cfg, metas, res, g):
    """Gradients via the jnp body in SAVED mode: the fused kernel is
    primal-only, so the backward recomputes the step with the
    differentiable XLA program and transposes it — but the saved probe
    subset (sweep winner + shadow any-hit bits, [C, R]-packed and
    checkpoint-named "txr_step_saved" by raw_step so the remat policy
    keeps them) lets the recompute skip every O(R·P) sweep: the nearest
    hit becomes the O(R) winner recompute and the shadow factor comes
    straight from the saved bits.  This removes what made the r4 backward
    ~8× the forward (it re-ran the full sweeps per step).

    A further structural choice from the r5 xplane profile: cotangents are
    computed ONLY for the args the outer differentiation perturbs (static,
    from the fwd's symbolic-zeros bits); unperturbed args and the probe
    packs get ``None`` — a JAX-level symbolic Zero, never an array.  (The
    gated recompute stays: a measured straight-line variant traded the
    cond-transpose zero-broadcasts for ungated per-step glossy/fetch work
    and came out 56 ms WORSE at 1080p.)"""
    scene, textures, st, p_save, (f_scene, f_tex) = res
    from txr.render.fused import saves_of_pr, unpack_pr

    scene_p, tex_p = bool(f_scene), bool(f_tex)
    m_save, m_rest = metas
    saved = saves_of_pr(unpack_pr(p_save, m_save))
    # fast_texels=False in the recompute: the u8 and f32 atlases store
    # bit-identical values (texture.quantize_u8), so the linearisation
    # point and every gradient are unchanged — but the f32 path never
    # touches the row-major-pinned u8 table, whose layout pin the backward
    # could only satisfy with a 52 MB copy PER cond context (~163 copies,
    # ~130 ms/frame in the r5 xplane capture: the pin cannot be hoisted
    # across the cond/while boundaries of the tier ladder).
    cfg_b = dataclasses.replace(cfg, fast_texels=False)
    g = jax.tree.map(_instantiate_ct, g)

    def run(sc, tx, s):
        return step_jnp(sc, tx, cfg_b, s, saved=saved)

    g_scene = g_tex = None
    if scene_p and tex_p:
        _, vjp = jax.vjp(run, scene, textures, st)
        g_scene, g_tex, g_st = vjp(g)
    elif scene_p:
        _, vjp = jax.vjp(lambda sc, s: run(sc, textures, s), scene, st)
        g_scene, g_st = vjp(g)
    elif tex_p:
        _, vjp = jax.vjp(lambda tx, s: run(scene, tx, s), textures, st)
        g_tex, g_st = vjp(g)
    else:
        _, vjp = jax.vjp(lambda s: run(scene, textures, s), st)
        (g_st,) = vjp(g)
    # the probe packs are detached by construction (the kernel consumes
    # everything under stop_gradient): None → symbolic zero, no array
    return (g_scene, g_tex, g_st, None, None)


_fused_step.defvjp(_fused_step_fwd, _fused_step_bwd, symbolic_zeros=True)


# step-level block compaction: below this ray count the gather/scatter
# overhead beats the savings (mirrors fused._COMPACT_MIN_R)
_STEP_COMPACT_MIN_R = 1 << 17


# Compaction tiers: the live-ray fraction collapses [1, .28, .08, .035,
# .018, ...] per bounce step (PROFILE_r3.md) while a single half-width tier
# executes [1, .5, .5, .5, ...] — most of the frame was dead-block work.
# Tiers are tried smallest-first; each instantiates the step body at
# KB = nb//frac blocks (program size scales with the tier count — 3 tiers
# measured worth it, r4).
_STEP_COMPACT_FRACS = (32, 8, 2)


def _block_compact_step(step, arr, block):
    """Run packed-carry ``step`` only on blocks of lanes with a live ray.

    The bounce-step body is a bit-exact identity on dead rays (the gating
    invariant), so gathering the alive blocks of the carry, stepping the
    compacted batch, and scattering the results back reproduces the full
    step exactly — while the probe kernel, texture fetches, and elementwise
    update all run at the compacted width.  Tiled ray order (render.TILE_H/
    W) clusters live lanes into few blocks; the tier ladder
    (_STEP_COMPACT_FRACS) picks the smallest width the live set fits.

    ``arr`` is the PACKED [R, 16] carry (pack_state): each cond boundary
    and each gather/scatter then touches one array, not 13 — the r4
    profile showed per-cond carry copies dominating the frame."""
    R = arr.shape[0]
    if R % block or R // block < 8:
        return step(arr)
    nb = R // block
    aliveb = jnp.any((arr[:, 14] > 0.5).reshape(nb, block), axis=1)
    cnt = jnp.sum(aliveb)

    def compact_at(KB):
        def compact(arr):
            bidx = jnp.nonzero(aliveb, size=KB, fill_value=nb)[0]
            src = jnp.minimum(bidx, nb - 1)
            blk = arr.reshape(nb, block, _PACK_COLS)
            sub = blk[src].reshape(KB * block, _PACK_COLS)
            out = step(sub)
            return (blk.at[bidx]
                    .set(out.reshape(KB, block, _PACK_COLS), mode="drop")
                    .reshape(R, _PACK_COLS))

        return compact

    # build the ladder inside-out: the coarsest tier wraps ``step`` and the
    # finest tier is checked first (outermost cond)
    out = step
    for frac in sorted(set(_STEP_COMPACT_FRACS)):
        KB = nb // frac
        if KB < 1:
            continue
        inner = out
        out = (lambda KB, inner: lambda arr: jax.lax.cond(
            cnt <= KB, compact_at(KB), inner, arr))(KB, inner)
    return out(arr)


def make_step_packed(scene, textures, cfg: RenderConfig):
    """One bounce-loop step over the PACKED [R, 16] carry — the form the
    scan, the step gate, and the compaction tiers all use (one array per
    boundary)."""

    def raw_step(st):
        if _use_fused(scene, cfg, st["ro"]):
            from jax.ad_checkpoint import checkpoint_name

            from txr.render.fused import _PR_SAVE, _probe, pack_pr

            # probe OUTSIDE the custom VJP so the [C, R]-packed backward
            # subset can be checkpoint-named in plain primal code: the
            # remat policy then saves it (R-minor → no lane padding) and
            # the backward's body-recompute DCEs the whole pallas probe
            # plus the forward-only rest pack (_fused_step_bwd)
            pr = _probe(scene, textures, cfg, st["ro"], st["rd"],
                        shade_flipped=True)
            R = st["ro"].shape[0]
            p_save, m_save = pack_pr(pr, R, _PR_SAVE)
            p_rest, m_rest = pack_pr(
                pr, R, [k for k in pr if k not in _PR_SAVE])
            p_save = checkpoint_name(p_save, "txr_step_saved")
            return _fused_step(cfg, (m_save, m_rest), scene, textures, st,
                               p_save, p_rest)
        return step_jnp(scene, textures, cfg, st)

    def raw_packed(arr):
        out = pack_state(raw_step(unpack_state(arr)))
        # tag for the remat policy (trace()): the step output is SAVED, so
        # the backward's body-recompute DCEs the whole fused forward (the
        # pallas probe + fetch machinery) instead of re-running it — the
        # step's differentiable path lives in the custom VJP, which needs
        # only the (already saved) input carry.  Cost: one extra [R,16]
        # per step per chunk (~the carry stack the scan saves anyway).
        from jax.ad_checkpoint import checkpoint_name

        return checkpoint_name(out, "txr_step_out")

    def body(arr):
        R = arr.shape[0]
        if cfg.gating and R > _STEP_COMPACT_MIN_R:
            from txr.render.fused import _COMPACT_BLOCK

            return _block_compact_step(raw_packed, arr, _COMPACT_BLOCK)
        return raw_packed(arr)

    return body


def make_step(scene, textures, cfg: RenderConfig):
    """One bounce-loop step as a reusable dict-state → dict-state function
    (profilers, bench live counts); trace() itself uses the packed form."""
    bp = make_step_packed(scene, textures, cfg)
    return lambda st: unpack_state(bp(pack_state(st)))


# ---------------------------------------------------------------------------
# Hand-rolled loop backward (cfg.bwd="loop", the fused-path default)
#
# The generic route — jax.checkpoint(scan_body) + lax.scan + the autodiff
# transpose — re-derives the bounce loop's backward from the forward's
# control flow, and the r5 xplane profile showed where that goes to die on
# TPU: every lax.cond (step gate, 3 compaction tiers, fetch gates)
# transposes into a cond whose untaken branch materialises full-width zero
# cotangents for every carried array, the remat recompute re-establishes
# the pinned atlas layout per cond context (~163 copies of the 52 MB u8
# table), and the saved probe pack gets banked at the UNION of all tier
# widths.  Writing the loop's VJP by hand removes all of that structurally:
#
# * fwd saves exactly (input carry [S,R,16], probe pack [S,C,R]) per chunk;
# * bwd is a reverse lax.scan whose body WE gate and tier-compact using the
#   saved alive mask (piecewise constant — the same invariant the forward
#   gates exploit): dead steps/blocks pass the cotangent through untouched,
#   live blocks run the saved-mode step VJP at compacted width;
# * parameter cotangents accumulate in explicit small carries, not through
#   cond-transpose unions.
# ---------------------------------------------------------------------------


@jax.tree_util.register_static
class _Static:
    """Hashable wrapper carrying static python data (the probe-pack meta)
    through a custom-VJP residual pytree."""

    def __init__(self, v):
        self.v = v

    def __eq__(self, o):
        return isinstance(o, _Static) and self.v == o.v

    def __hash__(self):
        return hash(self.v)


def _block_compact_step_save(step, arr, block):
    """_block_compact_step for a step that also returns its probe-save pack:
    arr -> (arr', p_save [C, R]).  Dead blocks keep their carry and write
    zeros into the pack (no live ray there → the backward never reads it)."""
    R = arr.shape[0]
    if R % block or R // block < 8:
        return step(arr)
    nb = R // block
    aliveb = jnp.any((arr[:, 14] > 0.5).reshape(nb, block), axis=1)
    cnt = jnp.sum(aliveb)

    def compact_at(KB):
        def compact(arr):
            bidx = jnp.nonzero(aliveb, size=KB, fill_value=nb)[0]
            src = jnp.minimum(bidx, nb - 1)
            blk = arr.reshape(nb, block, _PACK_COLS)
            sub = blk[src].reshape(KB * block, _PACK_COLS)
            out, ps = step(sub)
            C = ps.shape[0]
            arr2 = (blk.at[bidx]
                    .set(out.reshape(KB, block, _PACK_COLS), mode="drop")
                    .reshape(R, _PACK_COLS))
            # zero canvas derived from a varying input (not a fresh
            # constant) so the scatter operand carries the same
            # device-varying type as its updates under shard_map
            ps_full = ((jnp.zeros((C, nb, block), ps.dtype)
                        + arr[0, 0] * 0.0)
                       .at[:, bidx]
                       .set(ps.reshape(C, KB, block), mode="drop")
                       .reshape(C, R))
            return arr2, ps_full

        return compact

    out = step
    for frac in sorted(set(_STEP_COMPACT_FRACS)):
        KB = nb // frac
        if KB < 1:
            continue
        inner = out
        out = (lambda KB, inner: lambda arr: jax.lax.cond(
            cnt <= KB, compact_at(KB), inner, arr))(KB, inner)
    return out(arr)


def _loop_scan_saving(scene, textures, cfg, arr0):
    """Forward bounce loop that returns, besides the final carry, the
    per-step (input carry, probe pack) stacks the hand-rolled backward
    consumes, plus the static pack meta."""
    from txr.render.fused import _COMPACT_BLOCK, _PR_SAVE, _probe, pack_pr
    from txr.render.fused import fused_step_fwd

    metas_cell = []

    def raw(arr):
        st = unpack_state(arr)
        pr = _probe(scene, textures, cfg, st["ro"], st["rd"],
                    shade_flipped=True)
        R = arr.shape[0]
        p_save, m_save = pack_pr(pr, R, _PR_SAVE)
        if not metas_cell:
            metas_cell.append(m_save)
        return pack_state(fused_step_fwd(scene, textures, cfg, st, pr=pr)), \
            p_save

    R = arr0.shape[0]

    def stepped(arr):
        if cfg.gating and R > _STEP_COMPACT_MIN_R:
            return _block_compact_step_save(raw, arr, _COMPACT_BLOCK)
        return raw(arr)

    ps_sds = jax.eval_shape(
        lambda a: stepped(a)[1],
        jax.ShapeDtypeStruct(arr0.shape, arr0.dtype))

    def scan_body(arr, _):
        if cfg.gating:
            # the skip pack derives from a varying input (not a fresh
            # constant) so both cond branches agree on the device-varying
            # type under shard_map
            arr2, ps = jax.lax.cond(
                jnp.any(arr[:, 14] > 0.5), stepped,
                lambda a: (a, jnp.zeros(ps_sds.shape, ps_sds.dtype)
                           + a[0, 0] * 0.0), arr)
        else:
            arr2, ps = stepped(arr)
        return arr2, (arr, ps)

    arr_fin, (arr_ins, psaves) = jax.lax.scan(
        scan_body, arr0, None, length=cfg.max_steps)
    return arr_fin, arr_ins, psaves, metas_cell[0]


def _acc_init(tree, vzero):
    """Cotangent accumulator for a parameter pytree: zeros for inexact
    leaves, a scalar dummy for int/bool leaves (their cotangent is float0,
    which custom-VJP machinery replaces with a symbolic Zero regardless of
    the value returned — see jax _flatten_bwd).  ``vzero``: a zero scalar
    derived from a varying input, added so the accumulators carry the
    device-varying type of the per-device partial sums under shard_map."""
    return jax.tree.map(
        lambda x: jnp.zeros(x.shape, x.dtype) + vzero.astype(x.dtype)
        if jnp.issubdtype(x.dtype, jnp.inexact)
        else jnp.zeros((), jnp.float32) + vzero,
        tree)


def _acc_add(acc, g):
    def add(a, gl):
        if gl is None:
            return a
        if getattr(gl, "dtype", None) == jax.dtypes.float0:
            return a
        return a + gl

    return jax.tree.map(add, acc, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _traced_loop(cfg, scene, textures, arr0):
    # primal (inference path): exactly the gated/tiered scan of trace()
    body = make_step_packed(scene, textures, cfg)

    def sb(arr, _):
        if cfg.gating:
            return jax.lax.cond(
                jnp.any(arr[:, 14] > 0.5), body, lambda a: a, arr), None
        return body(arr), None

    arr, _ = jax.lax.scan(sb, arr0, None, length=cfg.max_steps)
    return arr


def _traced_loop_fwd(cfg, scene, textures, arr0):
    val = lambda t: jax.tree.map(lambda l: l.value, t)
    pert = lambda t: any(l.perturbed for l in jax.tree.leaves(t))
    flags = (((),) if pert(scene) else (), ((),) if pert(textures) else ())
    scene_v, tex_v, arr0_v = val(scene), val(textures), val(arr0)
    arr_fin, arr_ins, psaves, metas = _loop_scan_saving(
        scene_v, tex_v, cfg, arr0_v)
    return arr_fin, (scene_v, tex_v, arr_ins, psaves, _Static(metas), flags)


def _traced_loop_bwd(cfg, res, g):
    scene, textures, arr_ins, psaves, metas_s, (f_sc, f_tx) = res
    scene_p, tex_p = bool(f_sc), bool(f_tx)
    m_save = metas_s.v
    from txr.render.fused import _COMPACT_BLOCK, saves_of_pr, unpack_pr

    # fast_texels=False in the recompute: u8 and f32 atlases store
    # bit-identical values (texture.quantize_u8), so the linearisation point
    # and the gradients are unchanged — but the f32 path never touches the
    # row-major-pinned u8 table, whose pin the backward could only satisfy
    # with a 52 MB copy per cond context.
    cfg_b = dataclasses.replace(cfg, fast_texels=False)
    R = g.shape[0]

    def step_bwd(arr_in, ps, gc):
        """VJP of one saved-mode step at the given width."""
        saved = saves_of_pr(unpack_pr(ps, m_save))

        def run(sc, tx, a):
            return pack_state(
                step_jnp(sc, tx, cfg_b, unpack_state(a), saved=saved))

        if scene_p and tex_p:
            _, vjp = jax.vjp(run, scene, textures, arr_in)
            gs, gt, ga = vjp(gc)
        elif scene_p:
            _, vjp = jax.vjp(lambda sc, a: run(sc, textures, a),
                             scene, arr_in)
            gs, ga = vjp(gc)
            gt = None
        elif tex_p:
            _, vjp = jax.vjp(lambda tx, a: run(scene, tx, a),
                             textures, arr_in)
            gt, ga = vjp(gc)
            gs = None
        else:
            _, vjp = jax.vjp(lambda a: run(scene, textures, a), arr_in)
            (ga,) = vjp(gc)
            gs = gt = None
        return gs, gt, ga

    block = _COMPACT_BLOCK
    use_tiers = (cfg.gating and R > _STEP_COMPACT_MIN_R
                 and R % block == 0 and R // block >= 8)
    nb = R // block if block and R % block == 0 else 0

    def bwd_body(carry, xs):
        g, acc_s, acc_t = carry
        arr_in, ps = xs

        def live(args):
            g, acc_s, acc_t = args
            if not use_tiers:
                gs, gt, ga = step_bwd(arr_in, ps, g)
                return (ga,
                        _acc_add(acc_s, gs) if scene_p else acc_s,
                        _acc_add(acc_t, gt) if tex_p else acc_t)
            aliveb = jnp.any(
                (arr_in[:, 14] > 0.5).reshape(nb, block), axis=1)
            cnt = jnp.sum(aliveb)

            def compact_at(KB):
                def fn(args):
                    g, acc_s, acc_t = args
                    bidx = jnp.nonzero(aliveb, size=KB, fill_value=nb)[0]
                    src = jnp.minimum(bidx, nb - 1)
                    ab = arr_in.reshape(nb, block, _PACK_COLS)
                    gb = g.reshape(nb, block, _PACK_COLS)
                    C = ps.shape[0]
                    psb = ps.reshape(C, nb, block)
                    arr_c = ab[src].reshape(KB * block, _PACK_COLS)
                    g_c = gb[src].reshape(KB * block, _PACK_COLS)
                    ps_c = psb[:, src].reshape(C, KB * block)
                    gs, gt, ga_c = step_bwd(arr_c, ps_c, g_c)
                    # dead lanes: the step was an identity there, so their
                    # cotangent passes through unchanged (start from g)
                    g2 = (gb.at[bidx]
                          .set(ga_c.reshape(KB, block, _PACK_COLS),
                               mode="drop")
                          .reshape(R, _PACK_COLS))
                    return (g2,
                            _acc_add(acc_s, gs) if scene_p else acc_s,
                            _acc_add(acc_t, gt) if tex_p else acc_t)

                return fn

            def full(args):
                g, acc_s, acc_t = args
                gs, gt, ga = step_bwd(arr_in, ps, g)
                return (ga,
                        _acc_add(acc_s, gs) if scene_p else acc_s,
                        _acc_add(acc_t, gt) if tex_p else acc_t)

            out = full
            for frac in sorted(set(_STEP_COMPACT_FRACS)):
                KB = nb // frac
                if KB < 1:
                    continue
                inner = out
                out = (lambda KB, inner: lambda args: jax.lax.cond(
                    cnt <= KB, compact_at(KB), inner, args))(KB, inner)
            return out(args)

        if cfg.gating:
            carry2 = jax.lax.cond(
                jnp.any(arr_in[:, 14] > 0.5), live, lambda a: a,
                (g, acc_s, acc_t))
        else:
            carry2 = live((g, acc_s, acc_t))
        return carry2, None

    vzero = g[0, 0] * 0.0
    init = (g,
            _acc_init(scene, vzero) if scene_p else (),
            _acc_init(textures, vzero) if tex_p else ())
    (g0, acc_s, acc_t), _ = jax.lax.scan(
        bwd_body, init, (arr_ins, psaves), reverse=True)
    return (acc_s if scene_p else None,
            acc_t if tex_p else None,
            g0)


_traced_loop.defvjp(_traced_loop_fwd, _traced_loop_bwd, symbolic_zeros=True)


def trace(scene, textures, cfg: RenderConfig, ro, rd):
    """The iterative bounce loop (rt.frag:804-902).  ro, rd: [R,3] →
    RGB [R,3].  The scan carry is the PACKED [R, 16] state (pack_state):
    the step gate and compaction tiers then move one array per cond
    boundary instead of 13.

    Backward: the fused path routes the loop through _traced_loop (the
    hand-rolled loop VJP above, cfg.bwd="loop"); cfg.bwd="scan" keeps the
    generic jax.checkpoint + scan-transpose route (the diffing reference,
    and the only route for the jnp/CPU body)."""
    arr0 = pack_state(initial_state(ro, rd))

    if cfg.bwd == "loop" and _use_fused(scene, cfg, ro):
        arr = _traced_loop(cfg, scene, textures, arr0)
    else:
        body = make_step_packed(scene, textures, cfg)

        def scan_body(arr, _):
            # Fragment shaders break out of the loop per pixel; a TPU batch
            # can't — but it CAN skip a whole step when every ray in the
            # batch is dead (the common case for the refraction-budget tail
            # steps and for sky-dominated ray chunks).  body() is a
            # bit-exact identity on a dead batch, so the gate never changes
            # the image.
            if cfg.gating:
                arr2 = jax.lax.cond(
                    jnp.any(arr[:, 14] > 0.5), body, lambda a: a, arr)
            else:
                arr2 = body(arr)
            return arr2, None

        if cfg.remat:
            scan_body = jax.checkpoint(
                scan_body,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "txr_step_out", "txr_step_saved"),
            )
        arr, _ = jax.lax.scan(scan_body, arr0, None, length=cfg.max_steps)
    state = unpack_state(arr)

    # the single deferred environment fetch (see initial_state)
    from txr.utils.ablate import ablated

    if ablated("env"):
        return state["color"]

    missed = state["missed"]

    def env_pass(color):
        rd_env = state["rd"]        # frozen at the miss (dead-ray invariant)
        mask = jnp.where(missed[..., None], state["mask"], 0.0)
        R = missed.shape[0] if missed.ndim == 1 else 0
        if cfg.gating and R > _STEP_COMPACT_MIN_R:
            # sky lanes cluster (tiled ray order); fetch only blocks with a
            # recorded miss — placeholder values land on mask == 0 lanes
            from txr.render.fused import _block_compact

            env = _block_compact(
                lambda rd_: _background(scene, textures, rd_),
                missed, (rd_env,), (3,), rd_env.dtype, keep_frac=2)
        else:
            env = _background(scene, textures, rd_env)
        return color + env * mask

    if cfg.gating:
        return jax.lax.cond(
            jnp.any(missed), env_pass, lambda c: c, state["color"],
        )
    return env_pass(state["color"])
