"""Property tests (SURVEY §4 item 5): physical invariants of the renderer."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from txr.geometry import quaternion as q
from txr.scene.factories import SceneBuilder
from txr.render.texture import TextureSet
from txr.render.trace import RenderConfig
from txr.render.render import render_jit
from txr.render.shading import fresnel_reflect_amount, fresnel_schlick


def test_fresnel_multipliers_sum_to_one():
    """reflectMultiplier + refractMultiplier == 1 (rt.frag:849) and both in
    [0,1] for physical inputs."""
    rng = np.random.default_rng(0)
    n = rng.normal(size=(256, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    rd = rng.normal(size=(256, 3))
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    # face the ray like the trace loop does
    flip = (np.sum(rd * n, axis=-1) > 0)[:, None]
    n = np.where(flip, -n, n)
    refl = rng.uniform(0, 1, 256)
    for n1, n2 in [(1.0, 1.5), (1.5, 1.0), (1.0, 1.125)]:
        rm = np.array(
            fresnel_reflect_amount(
                jnp.full(256, n1), jnp.full(256, n2),
                jnp.asarray(rd, jnp.float32), jnp.asarray(n, jnp.float32),
                jnp.asarray(refl, jnp.float32),
            )
        )
        assert np.all(rm >= refl - 1e-6) and np.all(rm <= 1.0 + 1e-6)
    rm_s = np.array(
        fresnel_schlick(jnp.asarray(n, jnp.float32), jnp.asarray(rd, jnp.float32),
                        jnp.asarray(refl, jnp.float32))
    )
    assert np.all(rm_s >= refl - 1e-6) and np.all(rm_s <= 1.0 + 1e-6)


def test_fresnel_total_internal_reflection():
    """Grazing exit from a denser medium must return exactly 1.0
    (rt.frag:728-730)."""
    rd = jnp.asarray([[0.99, -0.141, 0.0]])
    rd = rd / jnp.linalg.norm(rd)
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    rm = float(
        fresnel_reflect_amount(jnp.array([1.5]), jnp.array([1.0]), rd, n, jnp.array([0.1]))[0]
    )
    assert rm == 1.0


def _simple_scene():
    b = SceneBuilder(camera_pos=(0, 0, -5))
    b.ambient_color = (0.025,) * 3
    b.shadow_ambient = (0.1,) * 3
    b.add_light_point((3, 5, 0), (1, 1, 1), 25.5)
    b.add_sphere((0.5, 0, 6), 1.0, b.material((0.2, 0.4, 1), specular=50, reflect=0.3))
    b.add_box((0, -1.2, 6), (10, 0.2, 5), b.material((1, 0.6, 0), specular=100))
    return b


def test_rotation_invariance():
    """Rotating the whole scene and the camera together must reproduce the
    image (up to rare f32 edge pixels)."""
    rot = q.from_axis_angle(jnp.array([0.3, 1.0, 0.2]), 0.7)

    def rotate_scene(scene):
        def rot_v(v):
            return q.rotate(rot, v)

        # rotating a primitive whose stored quat maps world->local means the
        # new quat is old_quat ∘ rot⁻¹
        def rot_q(quat):
            return q.mul(quat, q.conj(rot)[None])

        sp = dataclasses.replace(
            scene.spheres, pos=rot_v(scene.spheres.pos),
            quat=rot_q(scene.spheres.quat),
        )
        bx = dataclasses.replace(
            scene.boxes, pos=rot_v(scene.boxes.pos), quat=rot_q(scene.boxes.quat)
        )
        lp = dataclasses.replace(scene.lights_point, pos=rot_v(scene.lights_point.pos))
        cam = dataclasses.replace(
            scene.camera,
            pos=q.rotate(rot, scene.camera.pos),
            quat=q.mul(rot, scene.camera.quat),
        )
        return dataclasses.replace(scene, spheres=sp, boxes=bx, lights_point=lp, camera=cam)

    scene = _simple_scene().build()
    cfg = RenderConfig(width=48, height=32, refractive_glossy=False)
    base = np.array(render_jit(scene, TextureSet(), cfg))
    rotated = np.array(render_jit(rotate_scene(scene), TextureSet(), cfg))
    diff = np.abs(base - rotated).max(axis=-1)
    assert (diff > 5e-3).mean() < 0.02, (diff > 5e-3).mean()


def test_energy_bounded_without_lights():
    """With no lights and no ambient, every pixel is bounded by the skybox
    radiance (mask accumulator never exceeds 1 per channel)."""
    b = SceneBuilder(camera_pos=(0, 0, -5))
    b.add_sphere((0.5, 0, 6), 1.0, b.material((1, 1, 1), specular=0, reflect=0.4))
    b.add_sphere((-1.5, 0, 6), 1.0, b.material((1, 1, 1), refract=1.3, reflect=0.2, diffuse=1.0))
    b.add_box((0, -1.2, 6), (10, 0.2, 5), b.material((1, 1, 1)))
    scene = b.build()
    cm = jnp.full((6, 4, 4, 4), 0.75, jnp.float32)
    cfg = RenderConfig(width=32, height=24)
    img = np.array(render_jit(scene, TextureSet(cubemap=cm), cfg))
    assert img.max() <= 0.75 + 1e-5
    assert img.min() >= 0.0


def test_shadow_factor_range():
    from txr.render.intersect import shadow_factor

    scene = _simple_scene().build()
    rng = np.random.default_rng(1)
    ro = jnp.asarray(rng.uniform(-3, 3, (64, 3)), jnp.float32)
    rd = rng.normal(size=(64, 3))
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True), jnp.float32)
    s = np.array(shadow_factor(scene, ro, rd, jnp.full(64, 10.0)))
    assert np.all(s >= 0) and np.all(s <= 1)


def test_mask_monotone_nonincreasing_depth():
    """More bounce depth can only add light: images are monotone
    non-decreasing in iterations (mask accumulation is additive)."""
    scene = _simple_scene().build()
    cm = jnp.full((6, 4, 4, 4), 0.2, jnp.float32)
    tex = TextureSet(cubemap=cm)
    prev = None
    for it in (1, 2, 5):
        cfg = RenderConfig(width=32, height=24, iterations=it, refractive_glossy=False)
        img = np.array(render_jit(scene, tex, cfg))
        if prev is not None:
            assert (img - prev).min() >= -1e-5
        prev = img
