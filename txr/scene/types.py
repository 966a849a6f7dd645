"""Scene data model: SoA pytrees (the TPU equivalent of the reference UBOs).

The reference marshals scenes as 9 std140 uniform buffer objects of AoS
structs (/root/reference/src/scene.h:22-154, SceneManager.cpp:244-276).  On
TPU the same data becomes structure-of-arrays jnp pytrees: one stacked array
per field, batched over the primitive axis.  Counts are carried by array
shapes, which are static under ``jit`` — exactly mirroring the reference's
compile-time `{TYPE_SIZE}` template defines (scene.h:142-153,
GLWrapper.cpp:237-247): topology is frozen at trace time, parameters are
traced (and therefore differentiable).

Every numeric field is a leaf → the whole scene is a differentiable pytree;
``jax.grad`` w.r.t. a ``Scene`` gives per-parameter gradients for inverse
rendering.
"""

from __future__ import annotations

import dataclasses
from dataclasses import field

import jax
import jax.numpy as jnp
import numpy as np

# Hit-type codes, matching rt.frag:7-13 (order matters for argmin ties —
# see txr/render/intersect.py).
TYPE_SPHERE = 0
TYPE_PLANE = 1
TYPE_SURFACE = 2
TYPE_BOX = 3
TYPE_TORUS = 4
TYPE_RING = 5
TYPE_POINT_LIGHT = 6


def _pytree(cls=None, *, meta=()):
    """Register a dataclass whose fields are array leaves, except the named
    ``meta`` fields (static, hashable — the topology side of the
    defines-vs-UBO split)."""

    def wrap(cls):
        cls = dataclasses.dataclass(cls)
        names = [f.name for f in dataclasses.fields(cls)]
        jax.tree_util.register_dataclass(
            cls,
            data_fields=[n for n in names if n not in meta],
            meta_fields=list(meta),
        )
        return cls

    return wrap(cls) if cls is not None else wrap


def _f32(x):
    return jnp.asarray(x, dtype=jnp.float32)


@_pytree
class Materials:
    """rt_material SoA (scene.h:22-35).  All shapes [N, ...]."""

    color: jnp.ndarray      # [N,3]
    absorb: jnp.ndarray     # [N,3] Beer-Lambert absorption coefficients
    diffuse: jnp.ndarray    # [N]
    reflect: jnp.ndarray    # [N]
    refract: jnp.ndarray    # [N] index of refraction; 0 => opaque
    specular: jnp.ndarray   # [N] Phong exponent (int in the reference)
    kd: jnp.ndarray         # [N]
    ks: jnp.ndarray         # [N]

    @staticmethod
    def stack(mats):
        if not mats:
            z3 = jnp.zeros((0, 3), jnp.float32)
            z = jnp.zeros((0,), jnp.float32)
            return Materials(z3, z3, z, z, z, z, z, z)
        return Materials(
            color=_f32([m["color"] for m in mats]),
            absorb=_f32([m["absorb"] for m in mats]),
            diffuse=_f32([m["diffuse"] for m in mats]),
            reflect=_f32([m["reflect"] for m in mats]),
            refract=_f32([m["refract"] for m in mats]),
            specular=_f32([m["specular"] for m in mats]),
            kd=_f32([m["kd"] for m in mats]),
            ks=_f32([m["ks"] for m in mats]),
        )


@_pytree
class Spheres:
    """rt_sphere SoA (scene.h:37-44).  pos+radius = the vec4 `obj`."""

    pos: jnp.ndarray        # [N,3]
    radius: jnp.ndarray     # [N]
    quat: jnp.ndarray       # [N,4] rotates the *normal* for texturing only
    texture: jnp.ndarray    # [N] int32, 0 = untextured
    hollow: jnp.ndarray     # [N] bool — take far root when inside
    mat: Materials


@_pytree
class Planes:
    """rt_plane SoA (scene.h:46-50)."""

    pos: jnp.ndarray        # [N,3]
    normal: jnp.ndarray     # [N,3]
    mat: Materials


@_pytree
class Boxes:
    """rt_box SoA (scene.h:52-58).  `form` = half-extents."""

    pos: jnp.ndarray        # [N,3]
    quat: jnp.ndarray       # [N,4] world->box rotation
    form: jnp.ndarray       # [N,3]
    texture: jnp.ndarray    # [N] int32
    mat: Materials


@_pytree
class Toruses:
    """rt_torus SoA (scene.h:60-65).  form = (major R, minor r), z axis."""

    pos: jnp.ndarray        # [N,3]
    quat: jnp.ndarray       # [N,4]
    form: jnp.ndarray       # [N,2]
    mat: Materials


@_pytree
class Rings:
    """rt_ring SoA (scene.h:67-73).  r1/r2 are stored SQUARED
    (SceneManager.cpp:195-196)."""

    pos: jnp.ndarray        # [N,3]
    quat: jnp.ndarray       # [N,4]
    r1: jnp.ndarray         # [N] inner radius^2
    r2: jnp.ndarray         # [N] outer radius^2
    texture: jnp.ndarray    # [N] int32
    mat: Materials


@_pytree
class Surfaces:
    """rt_surface SoA (scene.h:75-95): quadric a x^2 + b y^2 + c z^2 +
    d z + e y + f = 0 in the rotated local frame, clipped by a world-space
    AABB [v_min, v_max]."""

    pos: jnp.ndarray        # [N,3]
    quat: jnp.ndarray       # [N,4]
    coef: jnp.ndarray       # [N,6] (a, b, c, d, e, f)
    v_min: jnp.ndarray      # [N,3]
    v_max: jnp.ndarray      # [N,3]
    mat: Materials


@_pytree
class PointLights:
    """rt_light_point SoA (scene.h:106-114)."""

    pos: jnp.ndarray        # [N,3]
    radius: jnp.ndarray     # [N] light-bulb sphere radius
    color: jnp.ndarray      # [N,3]
    intensity: jnp.ndarray  # [N]
    linear_k: jnp.ndarray   # [N]
    quadratic_k: jnp.ndarray  # [N]


@_pytree
class DirectLights:
    """rt_light_direct SoA (scene.h:99-104)."""

    direction: jnp.ndarray  # [N,3]
    color: jnp.ndarray      # [N,3]
    intensity: jnp.ndarray  # [N]


@_pytree
class Camera:
    """Camera pose (rt_scene quat + pos, scene.h:116-126).  Differentiable."""

    pos: jnp.ndarray        # [3]
    quat: jnp.ndarray       # [4] camera->world rotation (rt.frag:313-317)


@_pytree(meta=("reflect_depth",))
class Scene:
    """The full differentiable scene pytree — the reference's
    `scene_container` (scene.h:128-154) as stacked arrays.

    Counts live in the leading array dims (static under jit).  Texture
    *contents* live separately in :class:`txr.render.texture.TextureSet`
    because they are large, non-optimised buffers.
    """

    camera: Camera
    ambient_color: jnp.ndarray   # [3] (template define AMBIENT_COLOR)
    shadow_ambient: jnp.ndarray  # [3] (template define SHADOW_AMBIENT)
    bg_color: jnp.ndarray        # [3]
    spheres: Spheres
    planes: Planes
    surfaces: Surfaces
    boxes: Boxes
    toruses: Toruses
    rings: Rings
    lights_point: PointLights
    lights_direct: DirectLights
    # authored bounce budget (scene.h:125 reflect_depth -> the ITERATIONS
    # template define, SceneManager.cpp:233).  Static metadata: apps seed
    # RenderConfig.iterations from it.
    reflect_depth: int = 5

    @property
    def counts(self):
        return {
            "spheres": self.spheres.radius.shape[0],
            "planes": self.planes.pos.shape[0],
            "surfaces": self.surfaces.coef.shape[0],
            "boxes": self.boxes.pos.shape[0],
            "toruses": self.toruses.pos.shape[0],
            "rings": self.rings.pos.shape[0],
            "lights_point": self.lights_point.pos.shape[0],
            "lights_direct": self.lights_direct.direction.shape[0],
        }


def empty_scene():
    """A scene with zero primitives of every type (black render)."""
    z3 = jnp.zeros((0, 3), jnp.float32)
    z4 = jnp.zeros((0, 4), jnp.float32)
    z = jnp.zeros((0,), jnp.float32)
    zi = jnp.zeros((0,), jnp.int32)
    zb = jnp.zeros((0,), bool)
    m0 = Materials.stack([])
    return Scene(
        camera=Camera(pos=jnp.zeros(3, jnp.float32), quat=jnp.array([0, 0, 0, 1], jnp.float32)),
        ambient_color=jnp.zeros(3, jnp.float32),
        shadow_ambient=jnp.zeros(3, jnp.float32),
        bg_color=jnp.zeros(3, jnp.float32),
        spheres=Spheres(z3, z, z4, zi, zb, m0),
        planes=Planes(z3, z3, m0),
        surfaces=Surfaces(z3, z4, jnp.zeros((0, 6), jnp.float32), z3, z3, m0),
        boxes=Boxes(z3, z4, z3, zi, m0),
        toruses=Toruses(z3, z4, jnp.zeros((0, 2), jnp.float32), m0),
        rings=Rings(z3, z4, z, z, zi, m0),
        lights_point=PointLights(z3, z, z3, z, z, z),
        lights_direct=DirectLights(z3, z3, z),
    )
