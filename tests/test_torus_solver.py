"""Ferrari closed-form torus quartic vs the reference's Durand–Kerner.

The device path (txr/geometry/torus.py::torus_t) solves the quartic in
closed form; the reference iterates DK 60× (rt.frag:462-487) and the float64
oracle keeps that literal iteration.  Both must produce the same hits and
roots, except rays within the acceptance margin (grazing near-double roots,
where the |imag| ≤ 1e-3 rule is genuinely discontinuous in the inputs).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from txr.geometry import torus as tor
from txr.geometry import quaternion as q
from txr.ref.cpu_reference import _i_torus


def _random_cases(rng, n):
    """Random rays aimed near random tori so a good fraction hit."""
    pos = rng.uniform(-3, 3, (n, 3))
    R = rng.uniform(0.5, 2.0, n)
    r = rng.uniform(0.1, 0.9, n) * R
    axis = rng.normal(size=(n, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    ang = rng.uniform(0, np.pi, n)
    quat = np.stack(
        [axis[:, 0] * np.sin(ang / 2), axis[:, 1] * np.sin(ang / 2),
         axis[:, 2] * np.sin(ang / 2), np.cos(ang / 2)], axis=-1)
    ro = pos + rng.normal(size=(n, 3)) * 6.0
    aim = pos + rng.normal(size=(n, 3)) * 1.2   # aim near the torus
    rd = aim - ro
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return ro, rd, pos, quat, np.stack([R, r], axis=-1)


def test_ferrari_matches_oracle_dk():
    rng = np.random.default_rng(7)
    n = 512
    ro, rd, pos, quat, form = _random_cases(rng, n)

    # device (Ferrari, f32) — one torus per ray via the [R,P] API diagonal
    t_dev = np.array(
        jax.jit(jax.vmap(
            lambda o, d, p, qq, f: tor.torus_t(o[None], d[None], p[None], qq[None], f[None])[0, 0]
        ))(*map(jnp.asarray, (ro, rd, pos, quat, form)))
    )

    # oracle (DK, f64) — scalar loop
    t_ref = np.full(n, np.inf)
    for k in range(n):
        tk = _i_torus(ro[k], rd[k],
                      dict(pos=pos[k], quat=quat[k], form=form[k]), np.inf)
        if tk is not None:
            t_ref[k] = tk

    hit_dev = np.isfinite(t_dev)
    hit_ref = np.isfinite(t_ref)
    agree = hit_dev == hit_ref
    # the acceptance boundary (|imag| = 1e-3, t = 100) is genuinely
    # discontinuous; allow a small margin-band disagreement budget
    assert agree.mean() > 0.985, f"{(~agree).sum()}/{n} hit/miss disagreements"
    both = hit_dev & hit_ref
    assert both.sum() > 0.2 * n  # the aim heuristic must actually hit
    close = np.isclose(t_dev[both], t_ref[both], rtol=2e-3, atol=2e-3)
    # grazing near-double roots are ill-conditioned in every solver (f32
    # Ferrari and f32 DK disagree with the f64 oracle equally there) — allow
    # a ≤1% margin band, bounded in absolute size
    assert close.mean() > 0.99, f"{(~close).sum()}/{both.sum()} roots differ"
    assert np.abs(t_dev[both] - t_ref[both]).max() < 0.1


def test_ferrari_biquadratic_case():
    """Ray along the torus symmetry axis (z, rt.frag convention: the tube
    circles the z axis in the xy-plane) → q ≈ 0 (biquadratic split)."""
    ro = jnp.array([[0.0, 0.0, -5.0]])
    rd = jnp.array([[0.0, 0.0, 1.0]])   # through the hole
    pos = jnp.zeros((1, 3))
    quat = jnp.array([[0.0, 0.0, 0.0, 1.0]])
    form = jnp.array([[2.0, 0.5]])      # R=2, r=0.5: hole radius 1.5 → miss
    t = tor.torus_t(ro, rd, pos, quat, form)
    assert not bool(jnp.isfinite(t[0, 0]))

    # offset to x=2 (the tube centre circle): tube z = ±0.5 → t = 4.5
    ro2 = jnp.array([[2.0, 0.0, -5.0]])
    t2 = tor.torus_t(ro2, rd, pos, quat, form)
    assert abs(float(t2[0, 0]) - 4.5) < 1e-3


def test_ferrari_gradients_finite_and_match_fd():
    """Implicit-function gradient of t wrt the torus form, vs central FD."""
    ro = jnp.array([[2.0, 0.0, -5.0]])
    rd = jnp.array([[0.0, 0.0, 1.0]])
    pos = jnp.zeros((1, 3))
    quat = jnp.array([[0.0, 0.0, 0.0, 1.0]])

    def t_of(form):
        return tor.torus_t(ro, rd, pos, quat, form[None])[0, 0]

    form = jnp.array([2.0, 0.5])
    g = jax.grad(t_of)(form)
    assert np.isfinite(np.array(g)).all()
    eps = 1e-3
    for k in range(2):
        e = np.zeros(2)
        e[k] = eps
        fd = (float(t_of(form + e)) - float(t_of(form - e))) / (2 * eps)
        assert abs(float(g[k]) - fd) < 5e-2, (k, float(g[k]), fd)
