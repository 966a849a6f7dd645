"""XLA-side consumer of the fused step-probe kernel.

``fused_step_fwd`` is the forward bounce step built on
txr/kernels/pallas_step.py: the probe kernel does every sweep, the hit
info, Fresnel, and the per-light shading probes; this module applies the
one gated texture-atlas gather and the elementwise bounce-state update —
a short chain XLA fuses into a handful of kernels.

Semantics mirror txr/render/trace.py step_jnp line-for-line (same masks,
same update order, rt.frag:804-902); the golden/gate tests compare the two
paths.  Forward-only: trace.py wraps this in a custom VJP whose backward
recomputes step_jnp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from txr.render import texture as tx
from txr.render.shading import reflect, refract
from txr.utils.gather import small_take
from txr.scene.types import TYPE_SPHERE, TYPE_POINT_LIGHT
from txr.kernels.pallas_step import (
    step_probe_pallas,
    KIND_RGBA,
    KIND_BOX,
)


def _probe(scene, textures, cfg, ro, rd, shade_flipped):
    from txr.render.trace import _pix_angle

    pix = _pix_angle(cfg) or 0.0
    return step_probe_pallas(
        scene, textures.atlas2d, ro, rd,
        one_side=cfg.plane_oneside,
        shadow_enabled=cfg.shadow_enabled,
        do_fresnel=cfg.do_fresnel,
        tir=cfg.total_internal_reflection,
        pix_angle=pix,
        shade_flipped=shade_flipped,
    )


# shared block-compaction machinery (see txr/render/compact.py); the old
# names stay importable AND monkeypatchable (tests lower _COMPACT_MIN_R /
# _COMPACT_BLOCK to exercise compaction on tiny batches)
from txr.render.compact import block_compact as _block_compact_impl  # noqa: E402
from txr.render.compact import COMPACT_MIN_R as _COMPACT_MIN_R  # noqa: E402
from txr.render.compact import COMPACT_BLOCK as _COMPACT_BLOCK  # noqa: E402


def _block_compact(sample, need, args, out_feat, dtype, keep_frac=4):
    return _block_compact_impl(sample, need, args, out_feat, dtype,
                               keep_frac, block=_COMPACT_BLOCK)


def _fetch_texels(textures, cfg, pr, ty, alive=None):
    """The single gated atlas fetch serving every textured hit type —
    hit_info's unified fetch, fed by the kernel's requests.  Sphere lanes
    carry the texturing-rotated normal (Mosaic lacks atan2/asin); the
    spherical UV is finished here.

    ``alive`` tightens the skip gate: texel values on lanes outside it are
    never consumed, so the fetch may be skipped whenever no live lane
    requests one (the gate changes WHEN we fetch, never what any consumed
    lane sees)."""
    from txr.utils.ablate import ablated

    sa = textures.atlas2d
    if sa is None or ablated("hitfetch"):
        return None
    kind = pr["kind"]
    need = (kind == KIND_RGBA) | (kind == KIND_BOX)
    if alive is not None:
        need = need & alive
    req = pr["req"]
    sphere_tex = (kind == KIND_RGBA) & (ty == TYPE_SPHERE)
    uv = jnp.where(sphere_tex[..., None], tx.sphere_uv(req), req[..., :2])
    lod = pr["lod"] if cfg.texture_lod else None
    k = jnp.clip(pr["req_k"], 0, len(sa.pa.base) - 1)
    R = pr["t"].shape[0]
    dt = pr["t"].dtype

    if lod is None:
        sample = lambda k_, uv_: tx.sample_atlas(sa.pa, k_, uv_, None,
                                                 use_u8=True)
        args = (k, uv)
    else:
        sample = lambda k_, uv_, l_: tx.sample_atlas(sa.pa, k_, uv_, l_,
                                                     use_u8=True)
        args = (k, uv, lod)

    def fetch():
        if R <= _COMPACT_MIN_R:  # tiny batches: not worth the overhead
            return sample(*args)
        return _block_compact(sample, need, args, (4,), dt, keep_frac=2)

    if cfg.gating:
        ones = jnp.broadcast_to(
            jnp.ones_like(pr["t"])[..., None], pr["t"].shape + (4,))
        return jax.lax.cond(jnp.any(need), fetch, lambda: ones)
    return fetch()


def _apply_texture(pr, texc):
    """Textured colour/alpha overrides (get_hit_info's per-type branches)."""
    mcol = pr["color"]
    alpha = jnp.ones_like(pr["t"])
    if texc is not None:
        kind = pr["kind"]
        rgba = kind == KIND_RGBA
        mcol = jnp.where(rgba[..., None], texc[..., :3], mcol)
        alpha = jnp.where(rgba, texc[..., 3], alpha)
        boxk = kind == KIND_BOX
        mcol = jnp.where(
            boxk[..., None], texc[..., :3] * pr["tex_w"][..., None], mcol)
    return mcol, alpha


def shadow_from_probes(scene, textures, cfg, solid, ring_hit, ring_uv):
    """Combined per-light shadow factor [R, L] from detached any-hit probe
    data (inShadow, rt.frag:630-658): solid occlusion + ring handling
    (opaque ring hit → full shadow; textured ring → texture-alpha
    attenuation at the saved hit UV, differentiable in texture content).
    Shared by the fused forward (_shade_from_probes) and the saved-probe
    backward consume (trace.step_jnp saved mode)."""
    c = scene.counts
    sh = solid                                               # [R, L]
    if c["rings"] and ring_hit is not None:
        rh = ring_hit                                        # [R, L, nr]
        ruv = ring_uv                                        # [R, L, nr, 2]
        from txr.utils.ablate import ablated

        textured = scene.rings.texture > 0
        have_tex = textures.ring is not None and not ablated("ringalpha")
        opaque = ~textured if have_tex else (textured | ~textured)
        sh = jnp.maximum(sh, jnp.any(rh & opaque, axis=-1).astype(sh.dtype))
        if have_tex:
            needa = rh & textured

            def alpha_fetch():
                flat = needa.reshape(-1)
                ruv_f = ruv.reshape(-1, 2)
                N = flat.shape[0]
                rap = textures.ring_alpha_packed
                if rap is not None:
                    # alpha-only ~1MB f32 quad table: small-table gather
                    # rate; f32 beats the u8 word here (gather_bench2.py,
                    # uint32 gathers ~60% slower than f32 on v5e)
                    sample = lambda uv_: tx.sample_packed(
                        rap, jnp.zeros(uv_.shape[:-1], jnp.int32), uv_,
                        None)[..., 0]
                else:
                    sample = lambda uv_: tx.sample_ring_texture(
                        textures, uv_, use_u8=True)[..., 3]
                if N <= _COMPACT_MIN_R:
                    a = sample(ruv_f)
                else:
                    a = _block_compact(
                        sample, flat, (ruv_f,), (), sh.dtype, keep_frac=4)
                a = a.reshape(needa.shape)
                return jnp.sum(jnp.where(needa, a, 0.0), axis=-1)

            if cfg.gating:
                # skip value derived from a varying input (sh), not a fresh
                # constant — both branches must agree on the device-varying
                # type under shard_map
                asum = jax.lax.cond(
                    jnp.any(needa), alpha_fetch, lambda: sh * 0.0)
            else:
                asum = alpha_fetch()
            sh = sh + asum
    return jnp.minimum(sh, 1.0)


def _shade_from_probes(scene, textures, cfg, pr, mcol):
    """calcShade finished from the kernel's per-light probes: shadow =
    min(solid + ring alphas, 1); Phong = ambient + kd·diffuse + ks·spec
    (rt.frag:660-709)."""
    c = scene.counts
    L = c["lights_point"] + c["lights_direct"]
    ambient = scene.ambient_color * mcol
    if L == 0:
        return ambient
    if cfg.shadow_enabled:
        sh = shadow_from_probes(scene, textures, cfg, pr["light_solid"],
                                pr["ring_hit"], pr["ring_uv"])
        factor = jnp.maximum((1.0 - sh)[..., None], scene.shadow_ambient)
    else:
        sh = pr["light_solid"]
        factor = jnp.ones(sh.shape + (3,), sh.dtype)
    lcolors = []
    if c["lights_point"]:
        lcolors.append(scene.lights_point.color)
    if c["lights_direct"]:
        lcolors.append(scene.lights_direct.color)
    lcolor = jnp.concatenate(lcolors, axis=0)                # [L, 3]
    com = pr["light_s"][..., None] * factor                  # [R, L, 3]
    diffuse = jnp.sum(com * lcolor, axis=-2)
    spec = jnp.sum(com * lcolor * pr["light_spec"][..., None], axis=-2)
    return (ambient
            + diffuse * mcol * pr["diffuse"][..., None] * pr["kd"][..., None]
            + spec * pr["ks"][..., None])


def _types_of(scene, pr):
    from txr.render.intersect import _type_tables

    type_tab, idx_tab = _type_tables(scene)
    hit = jnp.isfinite(pr["t"])
    ty = jnp.where(hit, small_take(type_tab, pr["slot"]), -1)
    idx = small_take(idx_tab, pr["slot"])
    return hit, ty, idx


# probe fields that are integer/bool; everything else is f32 already.
# slot/kind/req_k are small counts and the flags are 0/1 — all exact in f32.
_PR_INT = ("slot", "kind", "req_k")
_PR_BOOL = ("outside", "ring_hit")


# the probe subset the backward consume reads (saves_of_pr); everything
# else is consumed by the forward only, so it must NOT become a saved
# residual — each bounce step would otherwise bank the full 38-row probe
# (× every compaction-tier cond branch), ~6 GB of HBM at 1080p
_PR_SAVE = ("slot", "t", "light_solid", "ring_hit", "ring_uv")


def pack_pr(pr, R, keys):
    """Pack the given probe fields into ONE [C, R] f32 array + a static
    layout descriptor.

    The packed layout matters as much as the packing: the step's custom VJP
    saves the probe across the remat/scan boundary, and XLA lane-pads any
    saved [R, small] array to 128 lanes — the unpacked dict cost up to 64×
    its bytes in HBM padding (512 MB for one step's [R, L, nr, 2] ring_uv
    at 1080p, the r5 backward-OOM smoking gun).  [C, R] keeps R minor —
    natively tiled, zero padding — and matches the probe kernel's own
    [NF, R] output layout, so the pack is a cheap re-slice.

    Returns (packed, meta) with meta a hashable tuple of
    (name, feature-shape suffix) in row order — a static argument of the
    custom VJP."""
    rows = []
    meta = []
    for k in sorted(keys):
        v = pr.get(k)
        if v is None:
            continue
        suffix = tuple(v.shape[1:])
        v = v.astype(jnp.float32).reshape(R, -1).T      # [prod(suffix), R]
        rows.append(v)
        meta.append((k, suffix))
    if not rows:
        return jnp.zeros((0, R), jnp.float32), ()
    return jnp.concatenate(rows, axis=0), tuple(meta)


def meta_rows(meta):
    """Total packed rows described by a pack_pr meta tuple."""
    n = 0
    for _, suffix in meta:
        m = 1
        for s in suffix:
            m *= s
        n += m
    return n


def unpack_pr(packed, meta):
    """Inverse of pack_pr — exact: f32 round-trips, and the int/bool
    fields' values are small counts / 0-1 flags."""
    R = packed.shape[1]
    pr = {}
    r = 0
    for k, suffix in meta:
        n = 1
        for s in suffix:
            n *= s
        v = packed[r:r + n].T.reshape((R,) + suffix)
        r += n
        if k in _PR_INT:
            v = v.astype(jnp.int32)
        elif k in _PR_BOOL:
            v = v > 0.5
        pr[k] = v
    for k in ("ring_hit", "ring_uv"):
        pr.setdefault(k, None)
    return pr


def saves_of_pr(pr):
    """The piecewise-constant subset of a probe that the backward consume
    (step_jnp saved mode) reads: the sweep winner and the shadow any-hit
    results.  Everything else in the step is recomputed differentiably."""
    return dict(slot=pr["slot"], t=pr["t"],
                light_solid=pr["light_solid"],
                ring_hit=pr["ring_hit"], ring_uv=pr["ring_uv"])


def fused_reflected_color(scene, textures, cfg, ro, rd):
    """getReflectedColor (rt.frag:787-802) on the probe kernel: one extra
    fused pass whose shading probes use the UNFLIPPED hit normal (the
    reference passes hit_info's normal straight through)."""
    pr = _probe(scene, textures, cfg, ro, rd, shade_flipped=False)
    hit0, ty, idx = _types_of(scene, pr)
    is_light = ty == TYPE_POINT_LIGHT
    hit = hit0 & ~is_light
    texc = _fetch_texels(textures, cfg, pr, ty)
    mcol, _ = _apply_texture(pr, texc)
    shade = _shade_from_probes(scene, textures, cfg, pr, mcol)
    color = jnp.where(hit[..., None], shade, 0.0)
    if scene.counts["lights_point"]:
        lcol = small_take(
            scene.lights_point.color,
            jnp.clip(idx, 0, scene.counts["lights_point"] - 1))
        color = jnp.where(is_light[..., None], lcol, color)
    return color


def fused_step_fwd(scene, textures, cfg, st, pr=None):
    """One bounce step, fused-forward form — the mirror of step_jnp.

    ``pr``: a precomputed probe (trace.raw_step runs it separately so the
    encoded copy can be checkpoint-named for the backward consume); None
    runs it here."""
    ro, rd = st["ro"], st["rd"]
    alive = st["alive"]
    color, mask = st["color"], st["mask"]
    absorb_dist = st["absorb_dist"]
    bounces = st["bounces"]

    if pr is None:
        pr = _probe(scene, textures, cfg, ro, rd, shade_flipped=True)
    t = pr["t"]
    hit, ty, idx = _types_of(scene, pr)
    act = alive & hit
    # miss → deferred environment, one bit (see trace.initial_state)
    miss = alive & ~hit
    missed = st["missed"] | miss
    alive = alive & hit

    if scene.counts["lights_point"]:
        is_light = act & (ty == TYPE_POINT_LIGHT)
        lcol = small_take(
            scene.lights_point.color,
            jnp.clip(idx, 0, scene.counts["lights_point"] - 1))
        color = jnp.where(is_light[..., None], color + lcol * mask, color)
        alive = alive & ~is_light
        act = act & ~is_light

    texc = _fetch_texels(textures, cfg, pr, ty, alive=st["alive"])
    mcol, alpha = _apply_texture(pr, texc)

    n = pr["n"]                      # already backface-flipped in-kernel
    outside = pr["outside"]
    t_safe = jnp.where(hit, t, 0.0)
    pt = ro + rd * t_safe[..., None]
    bias = ((9e-3 * t_safe + 35.0) / 35e3)[..., None]

    refr_idx = pr["refract"]
    refl = pr["reflect"]
    is_refractive = refr_idx > 0.0
    reflect_mult = pr["rm"]
    refract_mult = 1.0 - reflect_mult

    shade_origin_out = pt + n * bias
    shade_origin_in = pt - n * bias

    refr_act = act & is_refractive
    glossy = refr_act & outside & (refl > 0.0)
    if cfg.refractive_glossy:
        ro_g = shade_origin_out
        rd_g = reflect(rd, n)
        R = glossy.shape[0]

        def _rc_full():
            return fused_reflected_color(scene, textures, cfg, ro_g, rd_g)

        def _rc():
            # glossy lanes are rare (the reference pays getReflectedColor
            # only on fragments taking the branch, rt.frag:851-855); probe
            # block-compacted rays instead of the full width
            if R <= _COMPACT_MIN_R:
                return _rc_full()
            return _block_compact(
                lambda o, d: fused_reflected_color(scene, textures, cfg, o, d),
                glossy, (ro_g, rd_g), (3,), ro_g.dtype, keep_frac=8)

        def glossy_pass(cm):
            color, mask = cm
            rc = _rc()
            color = jnp.where(
                glossy[..., None],
                color + rc * reflect_mult[..., None] * mask, color)
            mask = jnp.where(
                glossy[..., None], mask * refract_mult[..., None], mask)
            return color, mask

        if cfg.gating:
            color, mask = jax.lax.cond(
                jnp.any(glossy), glossy_pass, lambda cm: cm, (color, mask))
        else:
            color, mask = glossy_pass((color, mask))

    inside = refr_act & ~outside
    absorb_dist = jnp.where(inside, absorb_dist + t, absorb_dist)
    beer = jnp.exp(-pr["absorb"] * absorb_dist[..., None])
    mask = jnp.where(inside[..., None], mask * beer, mask)

    if cfg.total_internal_reflection:
        tir = refr_act & (reflect_mult >= 1.0)
        alive = alive & ~tir
        refr_act = refr_act & ~tir

    eta = jnp.where(outside, 1.0 / jnp.maximum(refr_idx, 1e-6), refr_idx)
    new_rd_refr = refract(rd, n, eta)
    ro = jnp.where(refr_act[..., None], shade_origin_in, ro)
    rd = jnp.where(refr_act[..., None], new_rd_refr, rd)

    refl_act = act & ~is_refractive & (refl > 0.0)
    diff_act = act & ~is_refractive & (refl <= 0.0)
    needs_shade = refl_act | diff_act
    shade = _shade_from_probes(scene, textures, cfg, pr, mcol)
    shade = jnp.where(needs_shade[..., None], shade, 0.0)

    color = jnp.where(
        refl_act[..., None],
        color + shade * refract_mult[..., None] * mask, color)
    new_rd_refl = reflect(rd, n)
    ro = jnp.where(refl_act[..., None], shade_origin_out, ro)
    rd = jnp.where(refl_act[..., None], new_rd_refl, rd)
    mask = jnp.where(refl_act[..., None], mask * reflect_mult[..., None], mask)

    color = jnp.where(
        diff_act[..., None], color + shade * mask * alpha[..., None], color)
    translucent = diff_act & (alpha < 1.0)
    ro = jnp.where(translucent[..., None], shade_origin_in, ro)
    mask = jnp.where(
        translucent[..., None], mask * (1.0 - alpha[..., None]), mask)
    alive = alive & ~(diff_act & (alpha >= 1.0))

    if cfg.reflect_reduce_iteration:
        consumed = act & ~refr_act
    else:
        consumed = act
    bounces = jnp.where(consumed, bounces + 1, bounces)
    alive = alive & (bounces < cfg.iterations)

    return dict(
        ro=ro, rd=rd, color=color, mask=mask,
        absorb_dist=absorb_dist, bounces=bounces, alive=alive,
        missed=missed,
    )
