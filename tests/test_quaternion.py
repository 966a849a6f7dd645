"""Quaternion math vs first principles and reference conventions."""

import numpy as np
import jax.numpy as jnp

from txr.geometry import quaternion as q


def rot_matrix(axis, angle):
    axis = np.asarray(axis, float)
    axis = axis / np.linalg.norm(axis)
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


def test_rotate_matches_rotation_matrix(rng):
    for _ in range(20):
        axis = rng.normal(size=3)
        angle = rng.uniform(-np.pi, np.pi)
        v = rng.normal(size=3)
        quat = q.from_axis_angle(jnp.asarray(axis, jnp.float32), angle)
        got = np.array(q.rotate(quat, jnp.asarray(v, jnp.float32)))
        want = rot_matrix(axis, angle) @ v
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_mul_compose(rng):
    a = q.from_axis_angle(jnp.array([0.0, 0, 1]), 0.3)
    b = q.from_axis_angle(jnp.array([1.0, 0, 0]), 0.7)
    v = jnp.array([0.2, -1.3, 0.5])
    lhs = q.rotate(q.mul(a, b), v)
    rhs = q.rotate(a, q.rotate(b, v))
    np.testing.assert_allclose(np.array(lhs), np.array(rhs), atol=1e-5)


def test_conj_inverse_unit():
    quat = q.from_axis_angle(jnp.array([0.3, 0.5, 1.0]), 1.1)
    v = jnp.array([1.0, 2.0, 3.0])
    back = q.rotate(q.conj(quat), q.rotate(quat, v))
    np.testing.assert_allclose(np.array(back), np.array(v), atol=1e-5)


def test_nonunit_quat_scales_like_reference():
    """The reference rotate() uses conj, not inverse (rt.frag:305-311):
    a non-unit quat scales vectors by |q|^2."""
    quat = 2.0 * q.from_axis_angle(jnp.array([0.0, 0, 1]), np.pi / 2)
    v = jnp.array([1.0, 0, 0])
    got = np.array(q.rotate(quat, v))
    np.testing.assert_allclose(got, [0, 4, 0], atol=1e-5)


def test_inv_vs_conj_nonunit():
    quat = jnp.array([0.2, -0.4, 0.1, 0.8])
    v = jnp.array([0.5, 0.5, -1.0])
    back = q.rotate(q.inv(quat), q.rotate(quat, v))
    np.testing.assert_allclose(np.array(back), np.array(v), atol=1e-5)


def test_from_euler_matches_glm():
    """glm::quat(vec3(x,y,z)) half-angle product formula (used by the camera
    SceneManager.cpp:50 and the demo scene main.cpp:21)."""
    e = np.array([0.3, -0.8, 0.25])
    cx, cy, cz = np.cos(e / 2)
    sx, sy, sz = np.sin(e / 2)
    want = np.array(
        [
            sx * cy * cz - cx * sy * sz,
            cx * sy * cz + sx * cy * sz,
            cx * cy * sz - sx * sy * cz,
            cx * cy * cz + sx * sy * sz,
        ]
    )
    got = np.array(q.from_euler(jnp.asarray(e, jnp.float32)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_batch_broadcasting(rng):
    quats = jnp.asarray(rng.normal(size=(5, 4)), jnp.float32)
    vs = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    batched = np.array(q.rotate(quats, vs))
    for i in range(5):
        single = np.array(q.rotate(quats[i], vs[i]))
        np.testing.assert_allclose(batched[i], single, atol=1e-5)
