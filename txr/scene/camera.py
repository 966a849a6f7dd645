"""Interactive fly-camera controller.

A pure-Python state machine replicating the reference's GLFW-driven FPS
camera (SceneManager.cpp:43-135): yaw/pitch mouse look (sensitivity 0.05,
pitch clamped ±89°), WASD/space/ctrl movement at 3 u/s (×3 with shift, ÷6
with alt), camera quaternion from euler (−pitch, yaw, 0).

There is no window system on a TPU host; callers feed key states and mouse
deltas from whatever frontend they have (the demo app just scripts it).
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

from txr.geometry import quaternion as quat


@dataclasses.dataclass
class FlyCamera:
    position: tuple = (0.0, 0.0, 0.0)
    yaw: float = 0.0     # degrees, like the reference
    pitch: float = 0.0
    world_up: tuple = (0.0, 1.0, 0.0)
    sensitivity: float = 0.05           # SceneManager.cpp:124
    speed: float = 3.0                  # SceneManager.cpp:52
    # key states (SceneManager.cpp:76-101)
    w: bool = False
    a: bool = False
    s: bool = False
    d: bool = False
    space: bool = False
    ctrl: bool = False
    shift: bool = False
    alt: bool = False

    def mouse(self, dx, dy):
        """Mouse-look; dy positive = look up (SceneManager.cpp:110-135)."""
        self.yaw += dx * self.sensitivity
        self.pitch += dy * self.sensitivity
        self.pitch = max(-89.0, min(89.0, self.pitch))

    def key(self, name, pressed=True):
        setattr(self, name, pressed)

    def _front_right(self):
        ry, rp = math.radians(self.yaw), math.radians(self.pitch)
        front = (
            math.sin(ry) * math.cos(rp),
            math.sin(rp),
            math.cos(ry) * math.cos(rp),
        )
        # right = normalize(cross(-front, world_up)) (SceneManager.cpp:49)
        fx, fy, fz = front
        ux, uy, uz = self.world_up
        rx = -fy * uz + fz * uy
        rxy = -fz * ux + fx * uz
        rz = -fx * uy + fy * ux
        n = math.sqrt(rx * rx + rxy * rxy + rz * rz) or 1.0
        return front, (rx / n, rxy / n, rz / n)

    def update(self, dt):
        """Integrate one frame (SceneManager::update_scene, :43-74)."""
        front, right = self._front_right()
        speed = dt * self.speed
        if self.shift:
            speed *= 3.0
        if self.alt:
            speed /= 6.0
        px, py, pz = self.position

        def add(p, v, s):
            return (p[0] + v[0] * s, p[1] + v[1] * s, p[2] + v[2] * s)

        p = (px, py, pz)
        if self.w:
            p = add(p, front, speed)
        if self.s:
            p = add(p, front, -speed)
        if self.a:
            p = add(p, right, -speed)
        if self.d:
            p = add(p, right, speed)
        if self.space:
            p = add(p, self.world_up, speed)
        if self.ctrl:
            p = add(p, self.world_up, -speed)
        self.position = p

    @property
    def quat(self):
        """Camera rotation: glm::quat(vec3(−pitch, yaw, 0)) rad
        (SceneManager.cpp:50)."""
        return quat.from_euler(
            jnp.asarray(
                [-math.radians(self.pitch), math.radians(self.yaw), 0.0],
                jnp.float32,
            )
        )

    @property
    def pos(self):
        return jnp.asarray(self.position, jnp.float32)

    def apply(self, scene):
        """Return the scene with this camera pose written in."""
        import dataclasses as dc

        return dc.replace(
            scene, camera=dc.replace(scene.camera, pos=self.pos, quat=self.quat)
        )
