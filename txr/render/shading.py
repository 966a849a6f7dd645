"""Phong shading, Fresnel models, reflect/refract.

Vectorised re-design of calcShade/calcShade2 (rt.frag:660-709),
getFresnel (rt.frag:711-715) and FresnelReflectAmount (rt.frag:717-742).
All quantities are per-ray batches; lights are the inner (small) axis.
"""

from __future__ import annotations

import jax.numpy as jnp

from txr.render.intersect import shadow_factor, MAX_DIST
from txr.geometry.intersect import safe_normalize


def reflect(i, n):
    """GLSL reflect: i − 2·dot(n,i)·n."""
    return i - 2.0 * jnp.sum(n * i, axis=-1, keepdims=True) * n


def refract(i, n, eta):
    """GLSL refract; returns 0-vector on total internal reflection.
    Double-where on the sqrt so AD never sees d√0 = ∞ on TIR lanes."""
    cosi = jnp.sum(n * i, axis=-1, keepdims=True)
    k = 1.0 - eta[..., None] ** 2 * (1.0 - cosi * cosi)
    ok = k >= 0.0
    k_sqrt = jnp.sqrt(jnp.where(ok, k, 1.0))
    out = eta[..., None] * i - (eta[..., None] * cosi + jnp.where(ok, k_sqrt, 0.0)) * n
    return jnp.where(ok, out, 0.0)


def fresnel_schlick(n, rd, reflection):
    """getFresnel (rt.frag:711-715): Schlick with the material's base
    reflectivity.  Used for non-refractive materials."""
    ndotv = jnp.clip(jnp.sum(n * -rd, axis=-1), 0.0, 1.0)
    return reflection + (1.0 - reflection) * (1.0 - ndotv) ** 5


def fresnel_reflect_amount(n1, n2, rd, n, refl, do_fresnel=True):
    """FresnelReflectAmount (rt.frag:717-742) for refractive materials:
    Schlick between media n1→n2 with explicit total-internal-reflection
    (returns exactly 1.0), then blended with object reflectivity:
    refl + (1−refl)·schlick.

    Argument order matches the reference call site (rt.frag:842-844), where
    ``normal`` receives rd and ``incident`` receives the shading normal —
    cosX = −dot(rd, n).
    """
    if not do_fresnel:
        return refl
    # NaN-hardening: callers may evaluate this on lanes that are later
    # where()'d out (non-refractive materials feed n2 = 0); JAX's where does
    # not stop NaNs produced in the *forward* of the dead branch from
    # poisoning the backward pass, so every division/sqrt is guarded.
    n2_safe = jnp.where(jnp.abs(n2) > 1e-6, n2, 1.0)
    r0 = ((n1 - n2) / (n1 + n2_safe)) ** 2
    cos_x = -jnp.sum(rd * n, axis=-1)
    entering_denser = n1 > n2
    ratio = n1 / n2_safe
    sin_t2 = ratio * ratio * (1.0 - cos_x * cos_x)
    tir = jnp.logical_and(entering_denser, sin_t2 > 1.0)
    no_tir = sin_t2 < 1.0
    cos_t = jnp.sqrt(jnp.where(no_tir, 1.0 - sin_t2, 1.0))
    cos_x = jnp.where(entering_denser, jnp.where(no_tir, cos_t, 0.0), cos_x)
    x = 1.0 - cos_x
    ret = r0 + (1.0 - r0) * x ** 5
    ret = refl + (1.0 - refl) * ret
    return jnp.where(tir, 1.0, ret)


def _spec_pow(base, exponent):
    """pow with a zero-safe base so grads never NaN (base clamped to eps;
    pow(eps, spec≥1) ≈ 0 — bit-identical to 0 in f32 for real exponents)."""
    return jnp.power(jnp.maximum(base, 1e-12), exponent)


def calc_shade(
    scene,
    textures,
    pt,
    rd,
    mat_color,
    mat_diffuse,
    mat_specular,
    mat_kd,
    mat_ks,
    normal,
    do_shadow=True,
    shadow_enabled=True,
    one_side_planes=True,
    backend="auto",
    shadow_saved=None,
):
    """calcShade (rt.frag:681-709): ambient + per-light Phong with shadows
    and distance attenuation.

    pt, rd, normal: [R,3]; material fields: [R] / [R,3].  Returns RGB [R,3].

    ``shadow_saved`` ([R, L_total] with lights ordered point-then-direct,
    or None): precomputed per-light shadow factors — the backward consume
    (trace.step_jnp saved mode) passes the forward probe's any-hit results
    through fused.shadow_from_probes instead of re-running the occlusion
    sweep; occlusion is piecewise constant, so the gradients are identical.
    """
    R = pt.shape[:-1]
    diffuse = jnp.zeros(R + (3,), pt.dtype)
    specular = jnp.zeros(R + (3,), pt.dtype)

    def accumulate(light_dir, light_color, intensity, dist, dist_div,
                   diffuse, specular, sh_saved=None):
        """calcShade2 (rt.frag:660-679).  light axis = second-to-last."""
        ld = safe_normalize(light_dir)
        dp = jnp.clip(jnp.sum(normal[..., None, :] * ld, axis=-1), 0.0, 1.0)
        lc = light_color * dp[..., None]
        if shadow_enabled and do_shadow:
            if sh_saved is not None:
                sh = sh_saved
            else:
                # one any-hit sweep for ALL lights: flatten the light axis
                # into the ray axis so L lights cost one kernel launch and
                # one ring-alpha fetch pass instead of L of each
                ro_f = jnp.broadcast_to(
                    pt[..., None, :], ld.shape).reshape(-1, 3)
                sh = shadow_factor(
                    scene, ro_f, ld.reshape(-1, 3), dist.reshape(-1),
                    textures, one_side_planes, backend,
                ).reshape(dist.shape)  # [R, L]
            lc = lc * jnp.maximum((1.0 - sh)[..., None], scene.shadow_ambient)
        w = (intensity / dist_div)[..., None]
        diffuse = diffuse + jnp.sum(
            lc * mat_color[..., None, :] * mat_diffuse[..., None, None] * w, axis=-2
        )
        refl = reflect(ld, normal[..., None, :])
        spec_dp = jnp.clip(jnp.sum(rd[..., None, :] * refl, axis=-1), 0.0, 1.0)
        spec = _spec_pow(spec_dp, mat_specular[..., None])
        spec = jnp.where(mat_specular[..., None] > 0, spec, 0.0)
        specular = specular + jnp.sum(lc * spec[..., None] * w, axis=-2)
        return diffuse, specular

    nlp = scene.counts["lights_point"]
    if nlp:
        lp = scene.lights_point
        light_dir = lp.pos - pt[..., None, :]            # [R,L,3]
        dist = jnp.sqrt(jnp.sum(light_dir * light_dir, axis=-1) + 1e-30)  # [R,L]
        dist_div = 1.0 + lp.linear_k * dist + lp.quadratic_k * dist * dist
        diffuse, specular = accumulate(
            light_dir, lp.color, lp.intensity, dist, dist_div, diffuse, specular,
            None if shadow_saved is None else shadow_saved[..., :nlp],
        )

    nld = scene.counts["lights_direct"]
    if nld:
        ld_ = scene.lights_direct
        light_dir = jnp.broadcast_to(-ld_.direction, pt.shape[:-1] + ld_.direction.shape)
        dist = jnp.full(pt.shape[:-1] + (nld,), MAX_DIST, pt.dtype)
        dist_div = jnp.ones_like(dist)
        diffuse, specular = accumulate(
            light_dir, ld_.color, ld_.intensity, dist, dist_div, diffuse, specular,
            None if shadow_saved is None else shadow_saved[..., nlp:nlp + nld],
        )

    ambient = scene.ambient_color * mat_color
    return ambient + diffuse * mat_kd[..., None] + specular * mat_ks[..., None]
