"""Batched ray–primitive intersection tests.

Every function here is the TPU-native re-design of one GLSL intersector from
the reference kernel (/root/reference/assets/shaders/rt.frag).  Where the
fragment shader runs one ray against one primitive inside a serial loop
(rt.frag:587-628), these run an entire ray batch against an entire primitive
SoA at once: rays have shape ``[R, 3]``, primitives are batched over ``P``,
and each test returns ``t`` of shape ``[R, P]`` with ``+inf`` marking a miss.
The nearest-hit "dispatcher" is then a single masked argmin over the
concatenated primitive axis (txr/render/intersect.py) instead of a branchy
loop — the shape XLA wants.

Differentiability: every test uses the where-guard ("double where") pattern so
reverse-mode AD never sees NaN/inf from inactive lanes (sqrt of negative
discriminants, division by degenerate denominators).  The ``t`` of the chosen
root is smooth in all primitive parameters away from silhouettes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from txr.geometry import quaternion as quat

INF = jnp.inf
MAX_DIST = 1.0e6  # maxDist, rt.frag:145


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def safe_sqrt(x, valid, eps=1e-12):
    """sqrt(x) where valid, 0 elsewhere — with grads killed on invalid lanes.

    Valid lanes floor the argument at ``eps``: a ray exactly tangent to a
    quadric (discriminant == 0.0 in f32 — ~1 in 10⁵ pixels at 1080p) is an
    *active* lane whose true dt/dparam is infinite, and one such pixel
    poisons every parameter gradient of the frame.  The floor caps the
    silhouette derivative at O(1/√eps) while perturbing t by ≤ √eps."""
    return jnp.where(
        valid, jnp.sqrt(jnp.maximum(jnp.where(valid, x, 1.0), eps)), 0.0
    )


def safe_normalize(v, eps=1e-30):
    """v/|v| with AD-safe zero handling: sqrt(sum+eps) keeps the backward
    pass finite at v=0 (jnp.linalg.norm's VJP NaNs there even when the
    output is unused downstream of a `where`)."""
    return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + eps)


def safe_div(num, den, valid, fallback=0.0):
    """num/den where valid, `fallback` elsewhere, grad-safe."""
    den_safe = jnp.where(valid, den, 1.0)
    return jnp.where(valid, num / den_safe, fallback)


# ---------------------------------------------------------------------------
# Sphere — rt.frag:342-354
# ---------------------------------------------------------------------------

def sphere_t(ro, rd, pos, radius, hollow):
    """Quadratic in half-b form.  ``hollow`` spheres take the far root when
    the near root is behind the origin (inside view), rt.frag:351-352.

    ro, rd: [R,3];  pos: [P,3], radius, hollow: [P]  →  t: [R,P].
    """
    oc = ro[..., None, :] - pos  # [R,P,3]
    b = _dot(oc, rd[..., None, :])
    c = _dot(oc, oc) - radius * radius
    h = b * b - c
    has_root = h >= 0.0
    hs = safe_sqrt(h, has_root)
    t_near = -b - hs
    t_far = -b + hs
    t = jnp.where(jnp.logical_and(hollow, t_near < 0.0), t_far, t_near)
    hit = jnp.logical_and(has_root, t > 0.0)
    return jnp.where(hit, t, INF)


def sphere_normal(pt, pos):
    """normalize(pt - center), rt.frag:748."""
    d = pt - pos
    return safe_normalize(d)


# ---------------------------------------------------------------------------
# Plane — rt.frag:356-370
# ---------------------------------------------------------------------------

def plane_t(ro, rd, pos, normal, one_side=True):
    """One-sided by default (PLANE_ONESIDE, rt.frag:21): a hit requires the
    ray to approach against the normal (denom < -1e-6)."""
    denom = jnp.clip(_dot(normal, rd[..., None, :]), -1.0, 1.0)  # [R,P]
    if one_side:
        facing = denom < -1e-6
    else:
        facing = jnp.abs(denom) > 1e-6
    p_ro = pos - ro[..., None, :]
    t = safe_div(_dot(p_ro, normal), denom, facing, INF)
    hit = jnp.logical_and(facing, t > 0.0)
    return jnp.where(hit, t, INF)


# ---------------------------------------------------------------------------
# Ring (flat annulus) — rt.frag:372-397
# ---------------------------------------------------------------------------

def ring_t(ro, rd, pos, q, r1, r2):
    """Rotate the ray into the ring frame, hit the z=0 plane, accept radii²
    in (r1, r2) — the radii arrive pre-squared (SceneManager.cpp:195-196)."""
    rdl = quat.rotate(q, rd[..., None, :])           # [R,P,3]
    rol = quat.rotate(q, ro[..., None, :] - pos)
    nz = rdl[..., 2] != 0.0
    t = safe_div(-rol[..., 2], rdl[..., 2], nz, INF)
    x = rol[..., 0] + rdl[..., 0] * t
    y = rol[..., 1] + rdl[..., 1] * t
    p = x * x + y * y
    hit = (t > 0.0) & (p < r2) & (p > r1) & nz
    return jnp.where(hit, t, INF)


def ring_uv(ro, rd, t, pos, q, r1, r2):
    """UV at the hit: u = (|xy|² − r1)/(r2 − r1), v = cos(theta)
    (rt.frag:385-386).  Per-ray single primitive: all args [R,...]."""
    rdl = quat.rotate(q, rd)
    rol = quat.rotate(q, ro - pos)
    x = rol[..., 0] + rdl[..., 0] * t
    y = rol[..., 1] + rdl[..., 1] * t
    p = x * x + y * y
    norm = jnp.sqrt(jnp.maximum(p, 1e-20))
    u = (p - r1) / (r2 - r1)
    v = x / norm  # dot(normalize((x,y)), (1,0))
    return jnp.stack([u, v], axis=-1)


def ring_normal(q):
    """rotate(quat_inv(q), (0,0,-1)), rt.frag:391-394."""
    z = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, -1.0], q.dtype), q[..., :3].shape
    )
    return quat.rotate(quat.inv(q), z)


# ---------------------------------------------------------------------------
# Box — rt.frag:399-427 (iq slab test)
# ---------------------------------------------------------------------------

def box_t(ro, rd, pos, q, form):
    """Slab test in the box frame.  NOTE (parity): the reference accepts
    tN < 0 when the origin is inside the box (rt.frag:417-423 never checks
    tN > 0), so a ray from inside reports a *negative* t — we reproduce
    that exactly."""
    rdl = quat.rotate(q, rd[..., None, :])
    rol = quat.rotate(q, ro[..., None, :] - pos)
    m = _safe_recip(rdl)
    n = m * rol
    k = jnp.abs(m) * form
    t1 = -n - k
    t2 = -n + k
    tN = jnp.max(t1, axis=-1)
    tF = jnp.min(t2, axis=-1)
    hit = jnp.logical_and(tN <= tF, tF >= 0.0)
    return jnp.where(hit, tN, INF)


def _safe_recip(v, big=1.0e30):
    """1/v with exact zeros mapped to a huge same-sign value.

    The GLSL slab test divides by the ray direction unguarded
    (rt.frag:407); it never sees exact zeros because pixel-centre rays have
    half-integer offsets.  A batched TPU kernel does see them (unit tests,
    axis-aligned cameras), and inf*0=NaN would poison the min-reductions, so
    zero components are treated as "parallel to slab": the huge reciprocal
    makes t1/t2 = ∓huge when inside the slab and a guaranteed miss outside.
    """
    tiny = 1.0 / big
    mag = jnp.maximum(jnp.abs(v), tiny)
    sign = jnp.where(v >= 0.0, 1.0, -1.0)
    return sign / mag


def box_normal(ro, rd, pos, q, form):
    """Face normal via the slab argmax (the sign/step trick rt.frag:422),
    rotated back to world.  Per-ray single primitive."""
    rdl = quat.rotate(q, rd)
    rol = quat.rotate(q, ro - pos)
    m = _safe_recip(rdl)
    n = m * rol
    k = jnp.abs(m) * form
    t1 = -n - k
    # step(t1.yzx, t1.xyz) * step(t1.zxy, t1.xyz): 1 where t1_i is the max
    ge1 = (t1 >= jnp.roll(t1, -1, axis=-1)).astype(t1.dtype)
    ge2 = (t1 >= jnp.roll(t1, -2, axis=-1)).astype(t1.dtype)
    nor = -jnp.sign(rdl) * ge1 * ge2
    return quat.rotate(quat.inv(q), nor)


# ---------------------------------------------------------------------------
# Quadric surface — rt.frag:499-585
# ---------------------------------------------------------------------------

def surface_t(ro, rd, pos, q, coef, v_min, v_max):
    """General quadric a·x²+b·y²+c·z²+d·z+e·y+f = 0 in the rotated local
    frame, with the world-space AABB clip of checkSurfaceEdges
    (rt.frag:500-512): if the near root lands outside the clip box, the far
    root is tried (and used).

    Parity note: the reference's degenerate-direction branch (|p2| < 1e-6,
    rt.frag:541-545) returns ``t > tmin`` — a comparison against the running
    minimum that *cannot* be a hit before anything else hits and corrupts
    the running min otherwise (an apparent reference bug on a measure-zero
    direction set).  We treat |p2| < 1e-6 as a miss.
    """
    rdl = quat.rotate(q, rd[..., None, :])   # [R,P,3]
    rol = quat.rotate(q, ro[..., None, :] - pos)
    a, b, c = coef[..., 0], coef[..., 1], coef[..., 2]
    d, e, f = coef[..., 3], coef[..., 4], coef[..., 5]
    d1, d2, d3 = rdl[..., 0], rdl[..., 1], rdl[..., 2]
    o1, o2, o3 = rol[..., 0], rol[..., 1], rol[..., 2]

    p1 = 2 * a * d1 * o1 + 2 * b * d2 * o2 + 2 * c * d3 * o3 + d * d3 + d2 * e
    p2 = a * d1 * d1 + b * d2 * d2 + c * d3 * d3
    p3 = a * o1 * o1 + b * o2 * o2 + c * o3 * o3 + d * o3 + e * o2 + f
    disc = p1 * p1 - 4.0 * p2 * p3
    ok = jnp.logical_and(disc >= 0.0, jnp.abs(p2) >= 1e-6)
    p4 = safe_sqrt(disc, ok)

    inv2p2 = safe_div(1.0, 2.0 * p2, ok)
    t1 = (-p1 - p4) * inv2p2
    t2 = (-p1 + p4) * inv2p2

    epsilon = 1e-4
    # pick near = smallest root > eps, far = the other (rt.frag:550-565)
    t1_ok = t1 > epsilon
    t2_ok = t2 > epsilon
    lo = jnp.minimum(t1, t2)
    hi = jnp.maximum(t1, t2)
    near = jnp.where(t1_ok & t2_ok, lo, jnp.where(t1_ok, t1, jnp.where(t2_ok, t2, INF)))
    far = jnp.where(t1_ok & t2_ok, hi, jnp.where(t1_ok, t2, jnp.where(t2_ok, t1, INF)))

    # world-space clip box (checkSurfaceEdges, rt.frag:500-512)
    def between(t):
        pt = ro[..., None, :] + rd[..., None, :] * t[..., None]
        return jnp.all((pt > v_min) & (pt < v_max), axis=-1)

    near_finite = jnp.isfinite(near)
    near_in = jnp.logical_and(near_finite, between(jnp.where(near_finite, near, 0.0)))
    far_finite = jnp.isfinite(far)
    far_usable = jnp.logical_and(far >= epsilon, far_finite)
    far_in = jnp.logical_and(far_usable, between(jnp.where(far_finite, far, 0.0)))

    t = jnp.where(near_in, near, jnp.where(far_in, far, INF))
    return jnp.where(ok, t, INF)


def surface_normal(ro, rd, t, pos, q, coef):
    """Analytic gradient (2a·x, 2b·y+e, 2c·z+d) in the local frame, rotated
    back (rt.frag:573-584).  Per-ray single primitive."""
    rol = quat.rotate(q, ro - pos)
    rdl = quat.rotate(q, rd)
    tm = rol + rdl * t[..., None]
    a, b, c = coef[..., 0], coef[..., 1], coef[..., 2]
    d, e = coef[..., 3], coef[..., 4]
    n = jnp.stack(
        [2 * a * tm[..., 0], 2 * b * tm[..., 1] + e, 2 * c * tm[..., 2] + d],
        axis=-1,
    )
    n = quat.rotate(quat.inv(q), n)
    return safe_normalize(n)


# ---------------------------------------------------------------------------
# Torus — rt.frag:438-497 (Durand–Kerner quartic) — see torus.py
# ---------------------------------------------------------------------------
from txr.geometry.torus import torus_t, torus_normal  # noqa: E402,F401
