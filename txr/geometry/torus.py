"""Ray–torus intersection: quartic root solve, TPU-style.

The reference solves the torus quartic per ray with a 60-iteration
Durand–Kerner (Weierstrass) fixed-point in GLSL complex arithmetic
(/root/reference/assets/shaders/rt.frag:438-497) and flags it as the
render-time hotspot (main.cpp:107-108).  Here the same simultaneous-root
iteration runs over the whole ``[R, P]`` ray×torus batch at once on the VPU,
with complex numbers as (re, im) pairs (TPU-friendly; no complex dtype).

Differentiation does NOT unroll the 60 iterations: the solver output is
detached and one Newton step on the quartic is applied in differentiable
form, so reverse-mode AD sees only the implicit-function gradient
  dt/dθ = −(∂f/∂θ) / (∂f/∂t)
at the (polished) root — stable and O(1) memory.  The fori_loop runs under
``stop_gradient`` so no iteration residuals are saved for the backward pass.

Root-acceptance semantics match the reference exactly (rt.frag:478-486):
|imag| ≤ 1e-3, real ≥ 0, and t < 100.  Before the acceptance test each DK
root gets ``POLISH_C`` complex Newton steps: DK leaves grazing (near-double)
roots with O(1e-3) |imag| noise that differs between XLA fusion layouts
(batch shapes change FMA contraction), which flipped the |imag| ≤ 1e-3
decision per layout; Newton contracts real roots' |imag| to ~ulp so the
decision becomes layout-stable.  Truly complex roots keep |imag| ≫ 1e-3,
so reference semantics are preserved.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from txr.geometry import quaternion as quat

DK_ITERS = 60          # rt.frag:471
DK_EPS = 1e-3          # rt.frag:463
TORUS_T_MAX = 100.0    # rt.frag:486
POLISH_C = 3           # complex Newton steps on each DK root pre-acceptance
POLISH_R = 2           # differentiable real Newton steps on the winner
INF = jnp.inf


def _cmul(a, b):
    """(re,im) complex multiply, rt.frag:439-441."""
    return jnp.stack(
        [
            a[..., 0] * b[..., 0] - a[..., 1] * b[..., 1],
            a[..., 0] * b[..., 1] + a[..., 1] * b[..., 0],
        ],
        axis=-1,
    )


def _cinv(c):
    """Complex reciprocal, rt.frag:442-444 (grad-safe: |c|² floored)."""
    d = c[..., 0] * c[..., 0] + c[..., 1] * c[..., 1]
    d = jnp.maximum(d, 1e-30)
    return jnp.stack([c[..., 0] / d, -c[..., 1] / d], axis=-1)


def _quartic_coeffs(ro, rd, R, r):
    """Coefficients of f(t) = (t²|rd|² + 2t ro·rd + |ro|² + R² − r²)²
    − 4R²(t²|rd.xy|² + 2t ro.xy·rd.xy + |ro.xy|²)   (rt.frag:445-455),
    expanded to c4 t⁴ + c3 t³ + c2 t² + c1 t + c0."""
    A = jnp.sum(rd * rd, axis=-1)
    B = 2.0 * jnp.sum(ro * rd, axis=-1)
    R2 = R * R
    C = jnp.sum(ro * ro, axis=-1) + R2 - r * r
    a2 = rd[..., 0] ** 2 + rd[..., 1] ** 2
    b2 = 2.0 * (ro[..., 0] * rd[..., 0] + ro[..., 1] * rd[..., 1])
    c2_ = ro[..., 0] ** 2 + ro[..., 1] ** 2
    four_R2 = 4.0 * R2
    return (
        A * A,
        2.0 * A * B,
        B * B + 2.0 * A * C - four_R2 * a2,
        2.0 * B * C - four_R2 * b2,
        C * C - four_R2 * c2_,
    )


def _feval_c(t, ro, rd, R, r):
    """Evaluate the quartic at complex t (cTorus, rt.frag:445-455)."""
    A = jnp.sum(rd * rd, axis=-1)
    B = 2.0 * jnp.sum(ro * rd, axis=-1)
    R2 = R * R
    C = jnp.sum(ro * ro, axis=-1) + R2 - r * r
    t2 = jnp.stack(
        [t[..., 0] * t[..., 0] - t[..., 1] * t[..., 1], 2.0 * t[..., 0] * t[..., 1]],
        axis=-1,
    )
    res = (
        t2 * A[..., None]
        + 2.0 * t * (0.5 * B)[..., None]
        + jnp.stack([C, jnp.zeros_like(C)], axis=-1)
    )
    res = _cmul(res, res)
    a2 = rd[..., 0] ** 2 + rd[..., 1] ** 2
    b2 = ro[..., 0] * rd[..., 0] + ro[..., 1] * rd[..., 1]
    c2_ = ro[..., 0] ** 2 + ro[..., 1] ** 2
    res2 = 4.0 * R2[..., None] * (
        t2 * a2[..., None]
        + 2.0 * t * b2[..., None]
        + jnp.stack([c2_, jnp.zeros_like(c2_)], axis=-1)
    )
    return res - res2


def _dk_solve(ro, rd, R, r):
    """Durand–Kerner, 60 fixed iterations (equivalent to the reference's
    early-exit loop: converged lanes take zero-size steps).  Returns the four
    roots as [..., 4, 2] (re, im)."""

    # Seeds derived from the (device-varying) ray arrays rather than fresh
    # constants so the fori_loop carry has a consistent sharding type under
    # shard_map (replicated-in/varying-out carries are rejected).
    zero = ro[..., 0] * 0.0

    def seed(re, im):
        return jnp.stack([zero + re, zero + im], axis=-1)

    c0 = seed(1.0, 0.0)                       # rt.frag:467-470
    c1 = seed(0.4, 0.9)
    w = seed(0.4, 0.9)
    c2 = _cmul(c1, w)
    c3 = _cmul(c2, w)

    def step(ci, ca, cb, cc):
        """DKstep (rt.frag:456-461): ci -= f(ci) / ((ci-ca)(ci-cb)(ci-cc))."""
        fc = _feval_c(ci, ro, rd, R, r)
        denom = _cmul(ci - ca, _cmul(ci - cb, ci - cc))
        fc = _cmul(fc, _cinv(denom))
        return ci - fc

    def body(_, roots):
        c0, c1, c2, c3 = roots
        c0 = step(c0, c1, c2, c3)
        c1 = step(c1, c2, c3, c0)
        c2 = step(c2, c3, c0, c1)
        c3 = step(c3, c0, c1, c2)
        return (c0, c1, c2, c3)

    c0, c1, c2, c3 = jax.lax.fori_loop(0, DK_ITERS, body, (c0, c1, c2, c3))
    return jnp.stack([c0, c1, c2, c3], axis=-2)


def _polish_roots_c(roots, coeffs, steps=POLISH_C):
    """Complex Newton polish of each quartic root (z -= f(z)/f'(z)).

    roots: [..., 4, 2] (re, im); coeffs: 5-tuple of [...] real coefficients
    (c4..c0).  Contracts converged real roots' |imag| to ~ulp so the
    DK_EPS acceptance test is stable across XLA fusion layouts."""
    c4, c3, c2, c1, c0 = (c[..., None] for c in coeffs)   # broadcast over the 4 roots
    zr, zi = roots[..., 0], roots[..., 1]

    def horner(ks, zr, zi):
        ar = jnp.broadcast_to(ks[0], zr.shape)
        ai = jnp.zeros_like(zr)
        for k in ks[1:]:
            ar, ai = ar * zr - ai * zi + k, ar * zi + ai * zr
        return ar, ai

    for _ in range(steps):
        fr, fi = horner((c4, c3, c2, c1, c0), zr, zi)
        gr, gi = horner((4.0 * c4, 3.0 * c3, 2.0 * c2, c1), zr, zi)
        m = jnp.maximum(gr * gr + gi * gi, 1e-30)
        zr = zr - (fr * gr + fi * gi) / m
        zi = zi - (fi * gr - fr * gi) / m
    return jnp.stack([zr, zi], axis=-1)


def torus_t(ro, rd, pos, q, form):
    """Nearest positive real root of the torus quartic.

    ro, rd: [R,3]; pos: [P,3]; q: [P,4]; form: [P,2] (R, r)  →  t: [R,P]
    (+inf on miss).  Forward value = DK root + one Newton polish; backward =
    implicit-function gradient through the polish step only.
    """
    rol = quat.rotate(q, ro[..., None, :] - pos)   # [R,P,3]
    rdl = quat.rotate(q, rd[..., None, :])
    R = jnp.broadcast_to(form[..., 0], rol.shape[:-1])
    r = jnp.broadcast_to(form[..., 1], rol.shape[:-1])

    # --- non-differentiable root find -------------------------------------
    sg = jax.lax.stop_gradient
    roots = _dk_solve(sg(rol), sg(rdl), sg(R), sg(r))   # [R,P,4,2]
    coeffs_sg = _quartic_coeffs(sg(rol), sg(rdl), sg(R), sg(r))
    roots = _polish_roots_c(roots, coeffs_sg)
    re = roots[..., 0]
    im = jnp.abs(roots[..., 1])
    bad = jnp.logical_or(im > DK_EPS, re < 0.0)          # rt.frag:481-484
    rs = jnp.where(bad, 1e4, re)
    t0 = jnp.min(rs, axis=-1)                            # [R,P]
    hit = jnp.logical_and(t0 > 0.0, t0 < TORUS_T_MAX)    # rt.frag:486

    # --- differentiable Newton polish (implicit function theorem) ---------
    c4, c3, c2, c1, c0 = _quartic_coeffs(rol, rdl, R, r)
    t0 = sg(t0)
    ts = jnp.where(hit, t0, 0.0)
    for _ in range(POLISH_R):  # Newton polishes: tight roots, same implicit grad
        f = (((c4 * ts + c3) * ts + c2) * ts + c1) * ts + c0
        fp = ((4.0 * c4 * ts + 3.0 * c3) * ts + 2.0 * c2) * ts + c1
        fp_safe = jnp.where(jnp.abs(fp) > 1e-6, fp, jnp.where(fp >= 0, 1e-6, -1e-6))
        ts = ts - f / fp_safe
    return jnp.where(hit, ts, INF)


def torus_normal(ro, rd, t, pos, q, form):
    """Gradient normal pos·(|pos|² − r² − R²·(1,1,−1)) in the torus frame
    (rt.frag:488-496).  Per-ray single primitive: all args [R,...]."""
    rol = quat.rotate(q, ro - pos)
    rdl = quat.rotate(q, rd)
    p = rol + rdl * t[..., None]
    R = form[..., 0]
    r = form[..., 1]
    k = jnp.sum(p * p, axis=-1) - r * r
    R2 = R * R
    n = p * jnp.stack([k - R2, k - R2, k + R2], axis=-1)
    n = quat.rotate(quat.inv(q), n)
    from txr.geometry.intersect import safe_normalize
    return safe_normalize(n)
