"""Gradient correctness: analytic (f32 JAX reverse-mode) vs central finite
differences evaluated with the float64 oracle — the BASELINE north-star.

Methodology (SURVEY §4 item 3): the point-sampled image is piecewise-smooth;
its gradient is well-defined away from silhouettes/shadow edges (a
measure-zero set).  Each test therefore evaluates the loss on *interior*
pixels — single pixels known to lie inside a region — so the finite
difference never steps across a discontinuity.  FD runs in float64 through
the oracle (the same function the golden tests prove equal to the JAX path),
giving trustworthy reference derivatives despite f32 analytic grads.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from txr.scene.factories import SceneBuilder
from txr.scene import surface_factory as sf
from txr.geometry import quaternion as q
from txr.render.texture import TextureSet, checkerboard
from txr.render.trace import RenderConfig
from txr.render.render import render_jit
from txr.ref.cpu_reference import render_oracle

CFG = RenderConfig(width=32, height=24, refractive_glossy=False)

# interior pixels for the scene below (row, col), chosen off silhouettes:
PX_SPHERE = (11, 19)   # centre of the blue sphere
PX_FLOOR = (15, 16)    # open floor (box top face)
PX_TORUS = (11, 10)    # torus tube
PX_CONE = (10, 25)     # quadric cone surface


def build_scene():
    b = SceneBuilder(camera_pos=(0, 0, -5))
    b.ambient_color = (0.025,) * 3
    b.shadow_ambient = (0.1,) * 3
    b.add_light_point((3, 5, 0), (1, 1, 1), 25.5)
    b.add_light_direct((3, -1, 1), (1, 1, 1), 1.5)
    b.add_sphere((1.5, 0, 6), 1.2, b.material((0, 0, 1), specular=50, reflect=0.35))
    b.add_box((0, -1.2, 6), (10, 0.2, 5), b.material((1, 0.6, 0), specular=100, reflect=0.05))
    tq = tuple(np.array(q.from_axis_angle(jnp.array([1.0, 0, 0]), np.pi / 3)))
    b.add_torus((-2.2, 0.3, 5), (1.0, 0.45), b.material((0.5, 0.4, 1), specular=200, reflect=0.2), quat=tq)
    cone = sf.elliptic_cone(1 / 2, 1 / 2, 1)
    rq = tuple(np.array(q.from_axis_angle(jnp.array([1.0, 0, 0]), np.pi / 2)))
    b.add_surface(cone, b.material((0.9, 0.1, 0.3), specular=200, reflect=0.2),
                  pos=(4.5, 3, 6), quat=rq, v_min=(-3e38, -0.5, -3e38), v_max=(3e38, 3, 3e38))
    return b.build()


SCENE = build_scene()
TEX = TextureSet()


def pixel_loss(scene, px):
    img = render_jit(scene, TEX, CFG)
    return img[px[0], px[1]].sum()


def oracle_loss(scene, px):
    return float(render_oracle(scene, TEX, CFG, pixels=[px])[0].sum())


def replace_leaf(scene, path, value):
    """Rebuild the scene pytree with one leaf array replaced."""
    obj = scene
    parts = path.split(".")
    stack = []
    for p in parts[:-1]:
        stack.append((obj, p))
        obj = getattr(obj, p)
    obj = dataclasses.replace(obj, **{parts[-1]: value})
    for parent, name in reversed(stack):
        obj = dataclasses.replace(parent, **{name: obj})
    return obj


_GRAD_CACHE = {}


def scene_grad(px):
    """One reverse-mode pass per probe pixel yields the gradient for EVERY
    scene leaf; all fd_checks at that pixel share it (the FD side is what
    varies per check)."""
    if px not in _GRAD_CACHE:
        _GRAD_CACHE[px] = jax.grad(
            lambda s: pixel_loss(s, px), allow_int=True
        )(SCENE)
    return _GRAD_CACHE[px]


def fd_check(path, index, px, eps, rtol=0.05, atol=5e-4):
    leaf = np.asarray(getattr_path(SCENE, path), np.float64)

    def perturbed(sign):
        v = leaf.copy()
        v[index] += sign * eps
        return replace_leaf(SCENE, path, jnp.asarray(v, jnp.float32))

    fd = (oracle_loss(perturbed(+1), px) - oracle_loss(perturbed(-1), px)) / (2 * eps)
    an = float(np.asarray(getattr_path(scene_grad(px), path))[index])
    np.testing.assert_allclose(an, fd, rtol=rtol, atol=atol)


def getattr_path(obj, path):
    for p in path.split("."):
        obj = getattr(obj, p)
    return obj


# -- primitive parameters ---------------------------------------------------

def test_grad_sphere_center():
    for axis in range(3):
        fd_check("spheres.pos", (0, axis), PX_SPHERE, 1e-3)


def test_grad_sphere_radius():
    fd_check("spheres.radius", (0,), PX_SPHERE, 1e-3)


def test_grad_box_form():
    fd_check("boxes.form", (0, 1), PX_FLOOR, 1e-3)


def test_grad_torus_pos_and_form():
    fd_check("toruses.pos", (0, 1), PX_TORUS, 1e-3, rtol=0.08)
    fd_check("toruses.form", (0, 0), PX_TORUS, 1e-3, rtol=0.08)
    fd_check("toruses.form", (0, 1), PX_TORUS, 1e-3, rtol=0.08)


def test_grad_quadric_coefficients():
    for ci in [0, 1, 2, 5]:
        fd_check("surfaces.coef", (0, ci), PX_CONE, 1e-4, rtol=0.08)


def test_grad_quadric_pos():
    fd_check("surfaces.pos", (0, 0), PX_CONE, 1e-3, rtol=0.08)


# -- materials --------------------------------------------------------------

def test_grad_material_color():
    fd_check("spheres.mat.color", (0, 2), PX_SPHERE, 1e-3)


def test_grad_material_reflect():
    fd_check("spheres.mat.reflect", (0,), PX_SPHERE, 1e-3)


def test_grad_material_diffuse_kd_ks():
    fd_check("boxes.mat.diffuse", (0,), PX_FLOOR, 1e-3)
    fd_check("boxes.mat.kd", (0,), PX_FLOOR, 1e-3)
    fd_check("boxes.mat.ks", (0,), PX_FLOOR, 1e-3)


# -- lights -----------------------------------------------------------------

def test_grad_light_point():
    fd_check("lights_point.pos", (0, 1), PX_FLOOR, 1e-3)
    fd_check("lights_point.intensity", (0,), PX_FLOOR, 1e-3)
    fd_check("lights_point.linear_k", (0,), PX_FLOOR, 1e-3)


def test_grad_light_direct():
    fd_check("lights_direct.direction", (0, 0), PX_FLOOR, 1e-3)
    fd_check("lights_direct.intensity", (0,), PX_FLOOR, 1e-3)


# -- camera -----------------------------------------------------------------

def test_grad_camera_pos():
    for axis in range(3):
        fd_check("camera.pos", (axis,), PX_SPHERE, 1e-3, rtol=0.08)


def test_grad_camera_quat():
    for c in range(4):
        fd_check("camera.quat", (c,), PX_SPHERE, 1e-3, rtol=0.08)


def test_grad_ambient():
    fd_check("ambient_color", (1,), PX_SPHERE, 1e-3)


def test_grad_finite_at_exact_tangency():
    """A ray whose discriminant is exactly 0.0 (silhouette) must yield a
    finite derivative: one such pixel at 1080p otherwise NaNs every scene
    gradient of the frame (safe_sqrt eps floor)."""
    from txr.geometry.intersect import sphere_t, surface_t

    ro = jnp.array([[0.0, 0.0, -5.0]])
    rd = jnp.array([[1.0, 0.0, 0.0]])
    pos = jnp.array([[3.0, 1.0, -5.0]])

    def f(r):
        return sphere_t(ro, rd, pos, jnp.array([r]), jnp.array([False]))[0, 0]

    t, dt = jax.jvp(f, (1.0,), (1.0,))
    assert np.isclose(float(t), 3.0, atol=1e-5)
    assert np.isfinite(float(dt))

    coef = jnp.array([[1.0, 1.0, 1.0, 0.0, 0.0, -1.0]])
    quat_id = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    big = jnp.array([[3e38, 3e38, 3e38]])

    def g(y):
        p = jnp.stack([jnp.asarray(3.0), y, jnp.asarray(-5.0)])[None]
        return surface_t(ro, rd, p, quat_id, coef, -big, big)[0, 0]

    t2, dt2 = jax.jvp(g, (1.0,), (1.0,))
    assert np.isclose(float(t2), 3.0, atol=1e-5)
    assert np.isfinite(float(dt2))
