"""Quaternion math for TXR.

Quaternions are stored ``(x, y, z, w)`` in the last axis — the same memory
convention the reference uses on the device side (GLSL ``vec4`` quats,
/root/reference/assets/shaders/rt.frag:285-311) and that ``glm::quat``
marshals into UBOs.

``rotate(q, v)`` computes ``q * v * conj(q)``, matching ``rotate`` in
rt.frag:305-311.  The reference stores *world→object* rotations on each
primitive (it applies ``rotate(obj.quat, world_vec)`` to enter the object
frame, and ``rotate(quat_inv(obj.quat), local_vec)`` to leave it,
rt.frag:399-426).  We keep the exact same convention so scene data is
interchangeable with the oracle.

All functions broadcast over arbitrary leading batch axes and are
differentiable by construction.  They are **array-namespace generic**: with
jax inputs they compute in jnp (traceable / differentiable); with plain
numpy/python inputs they compute entirely in numpy on the host.  Host-side
scene construction must use the numpy path — on a tunneled TPU runtime a
single device→host transfer (e.g. ``np.array(jnp_quat)``) permanently
degrades dispatch latency for the whole process, so setup code must never
touch the device.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _xp(*args):
    """jnp if any argument is a jax array/tracer, else numpy."""
    for a in args:
        if isinstance(a, (jax.Array, jax.core.Tracer)):
            return jnp
    return np


IDENTITY = np.array([0.0, 0.0, 0.0, 1.0], dtype=np.float32)


def identity(dtype=np.float32):
    """The identity rotation (x, y, z, w) = (0, 0, 0, 1)."""
    return np.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def conj(q):
    """Quaternion conjugate (rt.frag:285-288)."""
    xp = _xp(q)
    return q * xp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def inv(q):
    """Quaternion inverse: conj(q) / |q|^2 (rt.frag:290-293)."""
    return conj(q) / _xp(q).sum(q * q, axis=-1, keepdims=True)


def mul(q1, q2):
    """Hamilton product, component layout per rt.frag:295-303."""
    xp = _xp(q1, q2)
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return xp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q: q * (v, 0) * conj(q).

    Mirrors rt.frag:305-311.  Expanded to avoid materialising the
    intermediate pure quaternion — this is the innermost op of every
    intersector, so it runs once per (ray, primitive) pair.
    """
    xp = _xp(q, v)
    qv = q[..., :3]
    qw = q[..., 3:4]
    # For a general (possibly non-unit) quaternion, q*(v,0)*conj(q) =
    #   (w^2 - |qv|^2) v + 2 (qv.v) qv + 2 w (qv x v).
    # The reference uses the conjugate (not the inverse), so non-unit quats
    # scale vectors by |q|^2 — we reproduce that exactly.
    return (
        v * (qw * qw - xp.sum(qv * qv, axis=-1, keepdims=True))
        + 2.0 * qv * xp.sum(qv * v, axis=-1, keepdims=True)
        + 2.0 * qw * xp.cross(qv, v)
    )


def from_axis_angle(axis, angle):
    """Quaternion from (unnormalised ok) axis and angle — glm::angleAxis."""
    xp = _xp(axis, angle)
    axis = xp.asarray(axis, dtype=xp.float32)
    axis = axis / xp.linalg.norm(axis, axis=-1, keepdims=True)
    angle = xp.asarray(angle, dtype=xp.float32)
    half = angle / 2.0
    s = xp.sin(half)
    return xp.concatenate(
        [axis * s[..., None], xp.cos(half)[..., None]], axis=-1
    )


def from_euler(pitch_yaw_roll):
    """Quaternion from intrinsic XYZ euler angles — glm::quat(glm::vec3).

    glm's ``quat(vec3 eulerAngles)`` composes half-angle products as:
      w = cx*cy*cz + sx*sy*sz
      x = sx*cy*cz - cx*sy*sz
      y = cx*sy*cz + sx*cy*sz
      z = cx*cy*sz - sx*sy*cz
    with (x_angle, y_angle, z_angle) = pitch_yaw_roll halves.  Used by the
    camera (SceneManager.cpp:50) and demo scene (main.cpp:21,112).
    """
    xp = _xp(pitch_yaw_roll)
    p = xp.asarray(pitch_yaw_roll, dtype=xp.float32) / 2.0
    cx, cy, cz = xp.cos(p[..., 0]), xp.cos(p[..., 1]), xp.cos(p[..., 2])
    sx, sy, sz = xp.sin(p[..., 0]), xp.sin(p[..., 1]), xp.sin(p[..., 2])
    return xp.stack(
        [
            sx * cy * cz - cx * sy * sz,
            cx * sy * cz + sx * cy * sz,
            cx * cy * sz - sx * sy * cz,
            cx * cy * cz + sx * sy * sz,
        ],
        axis=-1,
    )


def normalize(q):
    xp = _xp(q)
    return q / xp.linalg.norm(q, axis=-1, keepdims=True)
