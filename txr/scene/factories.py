"""Scene construction: a builder with the reference factory semantics.

Mirrors ``SceneManager::create_*`` (/root/reference/src/SceneManager.cpp:137-236)
including every default: material diffuse=0.7, kd=0.8, ks=0.2; point-light
linear_k=0.22, quadratic_k=0.2 (SceneManager.h:17-23); ring radii stored
squared (SceneManager.cpp:195-196); reflect_depth default 5
(SceneManager.cpp:233).

Build pattern:

    b = SceneBuilder()
    b.add_sphere((2, 0, 6), 1.0, b.material((0, 0, 1), specular=50, reflect=0.35))
    scene = b.build()
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from txr.scene.types import (
    Boxes,
    Camera,
    DirectLights,
    Materials,
    Planes,
    PointLights,
    Rings,
    Scene,
    Spheres,
    Surfaces,
    Toruses,
)

IDENTITY_QUAT = (0.0, 0.0, 0.0, 1.0)
FLT_MAX = float(np.finfo(np.float32).max)


def material(
    color,
    specular=0,
    reflect=0.0,
    refract=0.0,
    absorb=(0.0, 0.0, 0.0),
    diffuse=0.7,
    kd=0.8,
    ks=0.2,
):
    """SceneManager::create_material defaults (SceneManager.h:17)."""
    return dict(
        color=tuple(color),
        absorb=tuple(absorb),
        diffuse=diffuse,
        reflect=reflect,
        refract=refract,
        specular=specular,
        kd=kd,
        ks=ks,
    )


class SceneBuilder:
    """Accumulates primitives host-side, then packs SoA jnp arrays."""

    def __init__(self, camera_pos=(0.0, 0.0, 0.0), camera_quat=IDENTITY_QUAT):
        self.camera_pos = tuple(camera_pos)
        self.camera_quat = tuple(camera_quat)
        self.ambient_color = (0.0, 0.0, 0.0)
        self.shadow_ambient = (0.0, 0.0, 0.0)
        self.bg_color = (0.0, 0.0, 0.0)
        self.reflect_depth = 5  # SceneManager.cpp:233
        self.spheres = []
        self.planes = []
        self.surfaces = []
        self.boxes = []
        self.toruses = []
        self.rings = []
        self.lights_point = []
        self.lights_direct = []

    material = staticmethod(material)

    def add_sphere(self, center, radius, mat, hollow=False, texture=0, quat=IDENTITY_QUAT):
        """SceneManager::create_sphere (SceneManager.cpp:153-161).  Returns
        the index for later animation edits."""
        self.spheres.append(
            dict(pos=tuple(center), radius=radius, quat=tuple(quat), texture=texture,
                 hollow=hollow, mat=mat)
        )
        return len(self.spheres) - 1

    def add_plane(self, normal, pos, mat):
        """SceneManager::create_plane (SceneManager.cpp:163-170)."""
        self.planes.append(dict(pos=tuple(pos), normal=tuple(normal), mat=mat))
        return len(self.planes) - 1

    def add_box(self, pos, form, mat, texture=0, quat=IDENTITY_QUAT):
        """SceneManager::create_box (SceneManager.cpp:172-179); form = half
        extents."""
        self.boxes.append(
            dict(pos=tuple(pos), form=tuple(form), quat=tuple(quat), texture=texture, mat=mat)
        )
        return len(self.boxes) - 1

    def add_torus(self, pos, form, mat, quat=IDENTITY_QUAT):
        """SceneManager::create_torus (SceneManager.cpp:181-188);
        form = (major radius R, tube radius r), axis = local z."""
        self.toruses.append(dict(pos=tuple(pos), form=tuple(form), quat=tuple(quat), mat=mat))
        return len(self.toruses) - 1

    def add_ring(self, pos, r1, r2, mat, texture=0, quat=IDENTITY_QUAT):
        """SceneManager::create_ring (SceneManager.cpp:190-198).  Radii are
        given UNsquared here and squared on store, like the reference."""
        self.rings.append(
            dict(pos=tuple(pos), r1=r1 * r1, r2=r2 * r2, quat=tuple(quat), texture=texture,
                 mat=mat)
        )
        return len(self.rings) - 1

    def add_surface(self, coef, mat, pos=(0.0, 0.0, 0.0), quat=IDENTITY_QUAT,
                    v_min=(-FLT_MAX,) * 3, v_max=(FLT_MAX,) * 3):
        """Raw quadric (a,b,c,d,e,f); see surface_factory for named shapes."""
        self.surfaces.append(
            dict(pos=tuple(pos), quat=tuple(quat), coef=tuple(coef),
                 v_min=tuple(v_min), v_max=tuple(v_max), mat=mat)
        )
        return len(self.surfaces) - 1

    def add_light_point(self, pos, color, intensity, radius=0.1,
                        linear_k=0.22, quadratic_k=0.2):
        """SceneManager::create_light_point (SceneManager.cpp:200-212,
        defaults SceneManager.h:23)."""
        self.lights_point.append(
            dict(pos=tuple(pos), radius=radius, color=tuple(color), intensity=intensity,
                 linear_k=linear_k, quadratic_k=quadratic_k)
        )
        return len(self.lights_point) - 1

    def add_light_direct(self, direction, color, intensity):
        """SceneManager::create_light_direct (SceneManager.cpp:214-223)."""
        self.lights_direct.append(
            dict(direction=tuple(direction), color=tuple(color), intensity=intensity)
        )
        return len(self.lights_direct) - 1

    # -- packing ---------------------------------------------------------

    def build(self) -> Scene:
        f32 = lambda key, rows, d=None: jnp.asarray(
            np.array([r[key] for r in rows], dtype=np.float32).reshape((len(rows),) + (d or ()))
        )

        def mats(rows):
            return Materials.stack([r["mat"] for r in rows])

        sp, pl, su, bx, to, ri = (self.spheres, self.planes, self.surfaces,
                                  self.boxes, self.toruses, self.rings)
        lp, ld = self.lights_point, self.lights_direct
        return Scene(
            camera=Camera(
                pos=jnp.asarray(self.camera_pos, jnp.float32),
                quat=jnp.asarray(self.camera_quat, jnp.float32),
            ),
            ambient_color=jnp.asarray(self.ambient_color, jnp.float32),
            shadow_ambient=jnp.asarray(self.shadow_ambient, jnp.float32),
            bg_color=jnp.asarray(self.bg_color, jnp.float32),
            spheres=Spheres(
                pos=f32("pos", sp, (3,)), radius=f32("radius", sp), quat=f32("quat", sp, (4,)),
                texture=jnp.asarray([r["texture"] for r in sp], jnp.int32),
                hollow=jnp.asarray([r["hollow"] for r in sp], bool), mat=mats(sp),
            ),
            planes=Planes(pos=f32("pos", pl, (3,)), normal=f32("normal", pl, (3,)), mat=mats(pl)),
            surfaces=Surfaces(
                pos=f32("pos", su, (3,)), quat=f32("quat", su, (4,)), coef=f32("coef", su, (6,)),
                v_min=f32("v_min", su, (3,)), v_max=f32("v_max", su, (3,)), mat=mats(su),
            ),
            boxes=Boxes(
                pos=f32("pos", bx, (3,)), quat=f32("quat", bx, (4,)), form=f32("form", bx, (3,)),
                texture=jnp.asarray([r["texture"] for r in bx], jnp.int32), mat=mats(bx),
            ),
            toruses=Toruses(
                pos=f32("pos", to, (3,)), quat=f32("quat", to, (4,)), form=f32("form", to, (2,)),
                mat=mats(to),
            ),
            rings=Rings(
                pos=f32("pos", ri, (3,)), quat=f32("quat", ri, (4,)), r1=f32("r1", ri),
                r2=f32("r2", ri),
                texture=jnp.asarray([r["texture"] for r in ri], jnp.int32), mat=mats(ri),
            ),
            lights_point=PointLights(
                pos=f32("pos", lp, (3,)), radius=f32("radius", lp), color=f32("color", lp, (3,)),
                intensity=f32("intensity", lp), linear_k=f32("linear_k", lp),
                quadratic_k=f32("quadratic_k", lp),
            ),
            lights_direct=DirectLights(
                direction=f32("direction", ld, (3,)), color=f32("color", ld, (3,)),
                intensity=f32("intensity", ld),
            ),
            reflect_depth=self.reflect_depth,
        )
