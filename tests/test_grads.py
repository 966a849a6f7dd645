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


# -- refractive / ring / plane coverage scene (VERDICT r4 item 4) -----------
# A hollow glass sphere (the reference's absorption path only fires for
# hollow spheres: a solid sphere's intersector returns no inside hit,
# rt.frag:342-354, so `!outside` never happens — main.cpp's glass sphere is
# hollow too), a one-sided floor plane, and a ring textured with a SMOOTH
# ramp (piecewise-linear in uv everywhere, so radii gradients — which act
# through the ring UV mapping, rt.frag:386 — have a robust FD).  bg_color
# is non-zero so rays refracted out to the environment still carry
# Fresnel/Beer dependence (rt.frag:851-873, 858-862).

PX_GLASS = (10, 16)   # glass sphere interior (upper half)
PX_GLASS2 = (12, 16)  # glass sphere interior (lower half; refracts to floor)
PX_RING2 = (9, 23)    # ring band interior
PX_PLANE = (18, 3)    # open floor plane, far from the sphere's shadow


def ramp_tex(n=16):
    """Smooth RGBA ramp: linear in u and v, alpha ∈ (0,1) so the ring also
    exercises the translucent-continue path (rt.frag:884-889)."""
    u, v = jnp.meshgrid(jnp.linspace(0.05, 0.95, n),
                        jnp.linspace(0.1, 0.9, n), indexing="xy")
    return jnp.stack([u, v, 0.5 * jnp.ones_like(u), 0.35 + 0.55 * u], axis=-1)


def build_scene_refractive():
    b = SceneBuilder(camera_pos=(0, 0, -5))
    b.ambient_color = (0.025,) * 3
    b.shadow_ambient = (0.1,) * 3
    b.bg_color = (0.25, 0.3, 0.45)
    b.add_light_point((3, 5, -1), (1, 1, 1), 25.5)
    b.add_light_direct((3, -1, 1), (1, 1, 1), 1.0)
    b.add_sphere((0.0, 0.2, 4.0), 1.3,
                 b.material((0.1, 0.2, 0.9), specular=100, reflect=0.25,
                            refract=1.125, absorb=(0.05, 0.15, 0.25)),
                 hollow=True)
    b.add_plane((0.0, 1.0, 0.0), (0.0, -1.6, 0.0),
                b.material((0.8, 0.6, 0.2), specular=50, reflect=0.05))
    rq = tuple(np.array(q.from_axis_angle(jnp.array([1.0, 0, 0]), np.pi / 2.6)))
    b.add_ring((2.8, 0.6, 6.0), 0.6, 1.7, b.material((0.9, 0.9, 0.9)),
               texture=1, quat=rq)
    return b.build()


SCENE2 = build_scene_refractive()
TEX2 = TextureSet(ring=ramp_tex())
# refractive_glossy ON: the glass sphere has reflect > 0, so the glossy
# one-bounce pass (getReflectedColor, rt.frag:787-802) is in the
# differentiated program — unlike CFG, which historically excluded it.
CFG2 = RenderConfig(width=32, height=24, refractive_glossy=True,
                    extra_refraction_steps=4)


def pixel_loss(scene, px, tex=TEX, cfg=CFG):
    img = render_jit(scene, tex, cfg)
    return img[px[0], px[1]].sum()


def oracle_loss(scene, px, tex=TEX, cfg=CFG):
    return float(render_oracle(scene, tex, cfg, pixels=[px])[0].sum())


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


def scene_grad(px, scene=SCENE, tex=TEX, cfg=CFG):
    """One reverse-mode pass per probe pixel yields the gradient for EVERY
    scene leaf; all fd_checks at that pixel share it (the FD side is what
    varies per check)."""
    key = (px, id(scene))
    if key not in _GRAD_CACHE:
        _GRAD_CACHE[key] = jax.grad(
            lambda s: pixel_loss(s, px, tex, cfg), allow_int=True
        )(scene)
    return _GRAD_CACHE[key]


def fd_check(path, index, px, eps, rtol=0.05, atol=5e-4,
             scene=SCENE, tex=TEX, cfg=CFG):
    leaf = np.asarray(getattr_path(scene, path), np.float64)

    def perturbed(sign):
        v = leaf.copy()
        v[index] += sign * eps
        return replace_leaf(scene, path, jnp.asarray(v, jnp.float32))

    fd = (oracle_loss(perturbed(+1), px, tex, cfg)
          - oracle_loss(perturbed(-1), px, tex, cfg)) / (2 * eps)
    an = float(np.asarray(getattr_path(
        scene_grad(px, scene, tex, cfg), path))[index])
    np.testing.assert_allclose(an, fd, rtol=rtol, atol=atol)


def fd_check2(path, index, px, eps=1e-3, rtol=0.08):
    """fd_check against the refractive scene (SCENE2/TEX2/CFG2)."""
    fd_check(path, index, px, eps, rtol=rtol,
             scene=SCENE2, tex=TEX2, cfg=CFG2)


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


# -- refractive path (rt.frag:851-873) --------------------------------------

def test_grad_refract_index():
    """d(pixel)/d(refraction index): acts through the Fresnel split AND the
    bent ray direction (rt.frag:869); checked on both sphere halves (one
    refracts to the environment, one to the floor)."""
    fd_check2("spheres.mat.refract", (0,), PX_GLASS)
    fd_check2("spheres.mat.refract", (0,), PX_GLASS2)


def test_grad_absorb():
    """Beer–Lambert absorption (rt.frag:858-862) on the inside leg of the
    hollow glass sphere."""
    for ch in range(3):
        fd_check2("spheres.mat.absorb", (0, ch), PX_GLASS)


def test_grad_refractive_reflect():
    """mat.reflect on a refractive material feeds both FresnelReflectAmount
    and the glossy one-bounce pass (refractive_glossy=True here)."""
    fd_check2("spheres.mat.reflect", (0,), PX_GLASS)


# -- ring parameters (radii act through the UV map, rt.frag:386) -------------

def test_grad_ring_radii():
    fd_check2("rings.r1", (0,), PX_RING2)
    fd_check2("rings.r2", (0,), PX_RING2)


def test_grad_ring_pos():
    fd_check2("rings.pos", (0, 0), PX_RING2)


# -- plane parameters --------------------------------------------------------

def test_grad_plane():
    fd_check2("planes.normal", (0, 0), PX_PLANE)
    fd_check2("planes.pos", (0, 1), PX_PLANE)


# -- texture contents (the inverse-rendering/texture-recovery contract) ------

def test_grad_texture_content_fast_equals_slow():
    """ADVICE r4 (high): fast_texels=True silently zeroed texture-CONTENT
    gradients.  The u8 fetch now linearises content through the f32 atlas,
    so grad(textures) must be non-zero AND identical to the fast_texels=
    False path (both linearise the same f32 samples)."""
    def tex_grad(cfg):
        g = jax.grad(
            lambda t: render_jit(SCENE2, t, cfg).sum(), allow_int=True
        )(TEX2)
        return np.asarray(g.ring)

    g_fast = tex_grad(CFG2)
    assert np.abs(g_fast).sum() > 1e-3, "texture-content gradients are zero"
    g_slow = tex_grad(dataclasses.replace(CFG2, fast_texels=False))
    np.testing.assert_allclose(g_fast, g_slow, rtol=1e-4, atol=1e-6)


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
