"""Ray–torus intersection: quartic root solve, TPU-style.

The reference solves the torus quartic per ray with a 60-iteration
Durand–Kerner (Weierstrass) fixed-point in GLSL complex arithmetic
(/root/reference/assets/shaders/rt.frag:438-497) and flags it as the
render-time hotspot (main.cpp:107-108).  DK is a GPU implementation detail;
the *semantics* are the root-acceptance rule (rt.frag:478-486): roots with
|imag| ≤ 1e-3 (near-double grazing pairs count as hits), real ≥ 0, t < 100.

The TPU device path solves the quartic in CLOSED FORM (Ferrari: resolvent
cubic by trig/Cardano + two quadratics) + Newton polish — ~100 flops and
zero loops vs DK's 60 × 4-root complex iterations, which as a
``fori_loop`` over [R, P, 4, 2] HBM-resident arrays was the measured
hot-spot of the whole renderer.  The |imag| ≤ 1e-3 acceptance maps to the
quadratics' discriminant: a complex pair y = −B/2 ± i·√(−D)/2 has
|imag| ≤ 1e-3 ⇔ D ≥ −4e-6, in which case the real part is taken as the
root, exactly like the reference's rule.  The float64 oracle keeps the
reference's literal DK iteration, so the two implementations stay
arms-length (tests/test_torus_solver.py compares them).

Differentiation does NOT go through the solver: its output is detached and
POLISH_R Newton steps on the quartic are applied in differentiable form, so
reverse-mode AD sees only the implicit-function gradient
  dt/dθ = −(∂f/∂θ) / (∂f/∂t)
at the (polished) root — stable and O(1) memory.

``_dk_solve`` (+ complex-Newton polish) is retained for cross-checking the
closed form (and for layout-stability history, see tests/test_ring.py).
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


def _cbrt_mag(x):
    """|x|^(1/3) via exp/log (Mosaic-lowerable; no pow with non-integer
    exponent inside Pallas kernels)."""
    ax = jnp.maximum(jnp.abs(x), 1e-30)
    return jnp.exp(jnp.log(ax) * (1.0 / 3.0))


RESOLVENT_NEWTON_ITERS = 20


def _resolvent_root(p, qq, r):
    """Largest real root m of the Ferrari resolvent
    m³ + p·m² + ((p²−4r)/4)·m − q²/8 = 0.

    The cubic is ≤ 0 at m=0 (−q²/8) and → +∞, so its largest real root is
    ≥ 0 — exactly the m the two-quadratic split needs.  Solved by unrolled
    Newton from the Lagrange upper bound 2·max(|A2|, √|A1|, ∛|A0|): above
    the largest root the cubic is positive, increasing, and convex, so
    Newton descends monotonically onto it (quadratically for simple roots,
    linearly for the q→0 double root — the residual-based split choice
    downstream absorbs that case).  Branch-free and acos-free, so the same
    code lowers inside the Pallas TPU kernel (Mosaic has no acos/cos) and in
    plain XLA.
    """
    A2 = p
    A1 = 0.25 * (p * p - 4.0 * r)
    A0 = -0.125 * qq * qq
    m = 2.0 * jnp.maximum(
        jnp.abs(A2),
        jnp.maximum(jnp.sqrt(jnp.abs(A1)), _cbrt_mag(A0)),
    ) + 1e-6
    for _ in range(RESOLVENT_NEWTON_ITERS):
        f = ((m + A2) * m + A1) * m + A0
        fp = (3.0 * m + 2.0 * A2) * m + A1
        ok = jnp.abs(fp) > 1e-20
        m = m - jnp.where(ok, f / jnp.where(ok, fp, 1.0), 0.0)
    return jnp.maximum(m, 0.0)


def ferrari_roots_tuple(c4, c3, c2, c1, c0):
    """All four quartic roots as ((re, im_sq) × 4) elementwise tuples.

    im_sq is the squared imaginary magnitude (0 for real roots); complex
    pairs report their real part in re — matching the reference's DK output
    that the |imag| ≤ DK_EPS acceptance inspects.  Pure elementwise jnp
    (rank-preserving), so the Pallas kernel calls it directly on [1, T]
    lane tiles."""
    inv4 = 1.0 / jnp.where(jnp.abs(c4) > 1e-20, c4, 1e-20)
    a = c3 * inv4
    b = c2 * inv4
    c = c1 * inv4
    d = c0 * inv4
    # depressed quartic y⁴ + p y² + q y + r, t = y − a/4
    a2 = a * a
    p = b - 0.375 * a2
    qq = c - 0.5 * a * b + 0.125 * a2 * a
    r = d - 0.25 * a * c + 0.0625 * a2 * b - (3.0 / 256.0) * a2 * a2

    m = _resolvent_root(p, qq, r)
    s = jnp.sqrt(jnp.maximum(2.0 * m, 0.0))

    # general split: y² ∓ s·y + (p/2 + m ± q/(2s)) = 0
    qs = qq / jnp.maximum(2.0 * s, 1e-12)
    gB1, gC1 = -s, 0.5 * p + m + qs
    gB2, gC2 = s, 0.5 * p + m - qs
    # biquadratic split (exact when q = 0): y² = z±,  z² + p z + r = 0
    db = jnp.sqrt(jnp.maximum(0.25 * p * p - r, 0.0))
    bB1, bC1 = jnp.zeros_like(p), 0.5 * p + db
    bB2, bC2 = jnp.zeros_like(p), 0.5 * p - db

    # pick the split whose factorization reproduces the depressed quartic
    # better: (y²+B1y+C1)(y²+B2y+C2) vs y⁴ + p y² + q y + r.  An axis-
    # symmetric ray gives q = 0 but f32 noise in the resolvent makes m ≈ 1e-4
    # instead of 0, which silently invalidates the general split — the
    # residual test catches that where a threshold on s cannot.
    def split_err(B1, C1, B2, C2):
        return (
            jnp.abs(C1 + C2 + B1 * B2 - p)
            + jnp.abs(B1 * C2 + B2 * C1 - qq)
            + jnp.abs(C1 * C2 - r) / (1.0 + jnp.abs(p))
        )

    use_biquad = split_err(bB1, bC1, bB2, bC2) < split_err(gB1, gC1, gB2, gC2)
    B1 = jnp.where(use_biquad, bB1, gB1)
    C1 = jnp.where(use_biquad, bC1, gC1)
    B2 = jnp.where(use_biquad, bB2, gB2)
    C2 = jnp.where(use_biquad, bC2, gC2)

    def quad(B, C):
        D = B * B - 4.0 * C
        sqD = jnp.sqrt(jnp.maximum(D, 0.0))
        re1 = 0.5 * (-B - sqD)
        re2 = 0.5 * (-B + sqD)
        # complex pair: re = −B/2 (both), im² = −D/4
        rec = -0.5 * B
        im_sq = jnp.maximum(-D, 0.0) * 0.25
        cplx = D < 0.0
        return (
            jnp.where(cplx, rec, re1), jnp.where(cplx, im_sq, 0.0),
            jnp.where(cplx, rec, re2), jnp.where(cplx, im_sq, 0.0),
        )

    r1, i1, r2, i2 = quad(B1, C1)
    r3, i3, r4, i4 = quad(B2, C2)
    off = 0.25 * a
    return ((r1 - off, i1), (r2 - off, i2), (r3 - off, i3), (r4 - off, i4))


def _ferrari_roots(c4, c3, c2, c1, c0):
    """Stacked variant: (re [..., 4], im_sq [..., 4])."""
    pairs = ferrari_roots_tuple(c4, c3, c2, c1, c0)
    return (
        jnp.stack([p[0] for p in pairs], axis=-1),
        jnp.stack([p[1] for p in pairs], axis=-1),
    )


def _newton_refine(ts, coeffs, steps):
    """Newton steps on the quartic; a step is SKIPPED where |f'| ≤ 1e-6
    (tangent root — a guarded division there would take a catastrophic
    jump).  Matches the oracle's polish exactly."""
    c4, c3, c2, c1, c0 = coeffs
    for _ in range(steps):
        f = (((c4 * ts + c3) * ts + c2) * ts + c1) * ts + c0
        fp = ((4.0 * c4 * ts + 3.0 * c3) * ts + 2.0 * c2) * ts + c1
        ok = jnp.abs(fp) > 1e-6
        ts = ts - jnp.where(ok, f / jnp.where(ok, fp, 1.0), 0.0)
    return ts


def torus_t(ro, rd, pos, q, form):
    """Nearest positive real root of the torus quartic.

    ro, rd: [R,3]; pos: [P,3]; q: [P,4]; form: [P,2] (R, r)  →  t: [R,P]
    (+inf on miss).  Forward value = Ferrari closed-form root + Newton
    polish; backward = implicit-function gradient through the polish only.
    """
    rol = quat.rotate(q, ro[..., None, :] - pos)   # [R,P,3]
    rdl = quat.rotate(q, rd[..., None, :])
    R = jnp.broadcast_to(form[..., 0], rol.shape[:-1])
    r = jnp.broadcast_to(form[..., 1], rol.shape[:-1])

    # --- non-differentiable root find (closed form) ------------------------
    sg = jax.lax.stop_gradient
    coeffs_sg = _quartic_coeffs(sg(rol), sg(rdl), sg(R), sg(r))
    re, im_sq = _ferrari_roots(*coeffs_sg)
    # Newton against the true quartic tightens f32 cancellation error in the
    # closed form — only for REAL roots: at a complex pair's real part the
    # derivative vanishes and f > 0, so a Newton step there shoots far away
    re_ref = _newton_refine(re, tuple(c[..., None] for c in coeffs_sg), 2)
    re = jnp.where(im_sq > 0.0, re, re_ref)
    bad = jnp.logical_or(im_sq > DK_EPS * DK_EPS, re < 0.0)  # rt.frag:481-484
    rs = jnp.where(bad, 1e4, re)
    t0 = jnp.min(rs, axis=-1)                            # [R,P]
    hit = jnp.logical_and(t0 > 0.0, t0 < TORUS_T_MAX)    # rt.frag:486

    # --- differentiable Newton polish (implicit function theorem) ---------
    coeffs = _quartic_coeffs(rol, rdl, R, r)
    t0 = sg(t0)
    ts = _newton_refine(jnp.where(hit, t0, 0.0), coeffs, POLISH_R)
    return jnp.where(hit, ts, INF)


def torus_polish_t(ro, rd, pos, q, form, t0):
    """Differentiable winner-recompute for an already-found torus root.

    ro, rd, pos, q, form: per-ray gathered single-primitive params [R,...];
    t0: detached root from the sweep (jnp all_t or the Pallas kernel), +inf
    on miss.  Applies the POLISH_R Newton steps in differentiable form so
    reverse-mode AD sees only the implicit-function gradient — no DK solve
    (the sweep already did it), so the backward-visible path is O(R) with no
    60-iteration loop."""
    rol = quat.rotate(q, ro - pos)
    rdl = quat.rotate(q, rd)
    R = form[..., 0]
    r = form[..., 1]
    coeffs = _quartic_coeffs(rol, rdl, R, r)
    hit = jnp.isfinite(t0)
    ts = _newton_refine(jnp.where(hit, jax.lax.stop_gradient(t0), 0.0),
                        coeffs, POLISH_R)
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
