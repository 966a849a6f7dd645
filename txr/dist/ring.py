"""Primitive-sharded ring sweep: nearest-hit for scenes too large to replicate.

The standard TXR sharding replicates the primitive SoA and shards rays
(txr/dist/sharded.py) — right for every reference-scale scene (SURVEY §2.4).
When a scene outgrows a chip's HBM, this module provides the contingency
design: shard the *primitive* axis over a mesh axis so each device keeps only
``1/n``-th of every primitive array resident, and rotate the **ray tiles**
around the ring with ``lax.ppermute`` (the ring-attention pattern, with rays
playing queries and primitive shards playing the KV blocks):

    step 0: tile_d  vs shard_d          — local nearest_hit
    step k: tile rotated k hops vs the shard that lives there
    carry:  running (t, type, index) argmin rides along with the tile

After ``n`` steps every tile has met every shard exactly once and the ``n``
permutes have brought it back to its home device, so the output sharding
equals the input sharding and no gather is needed.  Communication per step is
O(rays/n) over ICI, fully overlappable by XLA with the next step's intersect.

Tie semantics: within a shard the reference's type/index order is preserved
(txr/render/intersect.py); across shards an exact t-tie is broken by the
GLOBAL slot id (type-major processing order, then global primitive index) —
the same winner the replicated sweep's first-occurrence argmin picks — so
the result is bitwise identical for every mesh rotation / shard placement
(VERDICT r3 weak #7).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from txr.render.intersect import nearest_hit
from txr.scene.types import (
    Scene,
    TYPE_SPHERE,
    TYPE_PLANE,
    TYPE_SURFACE,
    TYPE_BOX,
    TYPE_TORUS,
    TYPE_RING,
    TYPE_POINT_LIGHT,
)

# Padding primitives are parked this far from the origin; any "hit" beyond
# the cap is a phantom from f32 rounding on the padded slots and is masked
# back to a miss.  Reference scenes span ~3.5e4 units (saturn orbit).
_PAD_POS = 3.0e8
_T_CAP = 1.0e8

# (scene field, type code) in the reference processing order.
_PRIM_FIELDS = (
    ("planes", TYPE_PLANE),
    ("spheres", TYPE_SPHERE),
    ("surfaces", TYPE_SURFACE),
    ("boxes", TYPE_BOX),
    ("toruses", TYPE_TORUS),
    ("rings", TYPE_RING),
    ("lights_point", TYPE_POINT_LIGHT),
)


def _pad_group(group, n, miss: dict):
    """Pad every leaf of a primitive SoA group to a count divisible by n.

    ``miss`` overrides per-field pad values so padded slots can never win a
    nearest-hit (e.g. degenerate ring radii, inverted quadric clip boxes);
    other fields pad with zeros at _PAD_POS-style defaults.
    """
    c = None
    for f in dataclasses.fields(group):
        v = getattr(group, f.name)
        if hasattr(v, "shape") and v.ndim >= 1:
            c = v.shape[0]
            break
    pad = (-c) % n
    if pad == 0:
        return group

    def pad_leaf(path, v):
        fill = miss.get(path)
        tail = v.shape[1:]
        if fill is None:
            block = jnp.zeros((pad,) + tail, v.dtype)
        else:
            block = jnp.broadcast_to(jnp.asarray(fill, v.dtype), (pad,) + tail)
        return jnp.concatenate([v, block])

    out = {}
    for f in dataclasses.fields(group):
        v = getattr(group, f.name)
        if dataclasses.is_dataclass(v):  # nested Materials
            out[f.name] = _pad_group(v, n, {})
        else:
            out[f.name] = pad_leaf(f.name, v)
    # nested Materials must still be padded to the group's new count even if
    # entered with the same original count — handled above since Materials
    # leaves share the count.
    return dataclasses.replace(group, **out)


def pad_scene_for_ring(scene: Scene, n: int) -> Scene:
    """Scene with every primitive-type count padded to a multiple of n using
    guaranteed-miss primitives (originals keep their indices: padding appends)."""
    far = (_PAD_POS, _PAD_POS, _PAD_POS)
    quat_id = (0.0, 0.0, 0.0, 1.0)
    return dataclasses.replace(
        scene,
        planes=_pad_group(scene.planes, n, {"pos": far, "normal": (0.0, 0.0, 0.0)}),
        spheres=_pad_group(scene.spheres, n, {"pos": far, "radius": 0.0, "quat": quat_id}),
        # inverted clip box (v_min > v_max) → the in-box test always fails
        surfaces=_pad_group(
            scene.surfaces, n,
            {"pos": far, "quat": quat_id, "coef": (1.0, 1.0, 1.0, 0.0, 0.0, -1.0),
             "v_min": (1.0, 1.0, 1.0), "v_max": (-1.0, -1.0, -1.0)},
        ),
        boxes=_pad_group(scene.boxes, n, {"pos": far, "quat": quat_id, "form": (0.0, 0.0, 0.0)}),
        toruses=_pad_group(scene.toruses, n, {"pos": far, "quat": quat_id, "form": (0.0, 0.0)}),
        # r2 < r1 → the annulus test r1 < p < r2 is empty
        rings=_pad_group(scene.rings, n, {"pos": far, "quat": quat_id, "r1": 1.0, "r2": 0.0}),
        lights_point=_pad_group(scene.lights_point, n, {"pos": far, "radius": 0.0}),
        lights_direct=_pad_group(scene.lights_direct, n, {}),
    )


def _scene_specs(scene: Scene, axis: str):
    """PartitionSpec pytree: primitive arrays shard dim 0 over ``axis``;
    camera/global colors replicate."""
    sharded_fields = {name for name, _ in _PRIM_FIELDS} | {"lights_direct"}

    def spec_group(group):
        out = {}
        for f in dataclasses.fields(group):
            v = getattr(group, f.name)
            out[f.name] = spec_group(v) if dataclasses.is_dataclass(v) else P(axis)
        return dataclasses.replace(group, **out)

    out = {}
    for f in dataclasses.fields(scene):
        if f.name == "reflect_depth":
            continue  # static pytree metadata, not a shardable leaf
        v = getattr(scene, f.name)
        if f.name in sharded_fields:
            out[f.name] = spec_group(v)
        elif dataclasses.is_dataclass(v):
            out[f.name] = jax.tree_util.tree_map(lambda _: P(), v)
        else:
            out[f.name] = P()
    return dataclasses.replace(scene, **out)


def ring_nearest_hit(scene: Scene, ro, rd, mesh, axis=None, one_side_planes=True):
    """calcInter (rt.frag:587-628) with primitives sharded over ``axis``.

    ro, rd: [R, 3] (replicated input; internally sharded over ``axis``).
    Returns (t [R], type [R], index [R]) with the same meaning as
    txr.render.intersect.nearest_hit — index refers to the *unpadded* scene.
    """
    axis = axis or mesh.axis_names[-1]
    n = mesh.shape[axis]
    if set(mesh.axis_names) != {axis} and mesh.size != n:
        raise ValueError("ring_nearest_hit shards over a single mesh axis; "
                         "use a 1-axis mesh or a submesh")

    padded = pad_scene_for_ring(scene, n)
    local_counts = {name: padded.counts[name] // n for name, _ in _PRIM_FIELDS}

    R = ro.shape[0]
    ray_pad = (-R) % n
    if ray_pad:
        ro = jnp.concatenate([ro, jnp.broadcast_to(ro[-1:], (ray_pad, 3))])
        rd = jnp.concatenate([rd, jnp.broadcast_to(rd[-1:], (ray_pad, 3))])

    scene_specs = _scene_specs(padded, axis)
    ray_spec = P(axis)
    perm = [(i, (i + 1) % n) for i in range(n)]

    # global slot-id bases per type (padded global counts, type-major) —
    # the deterministic cross-shard tiebreak key
    gbase = {}
    acc = 0
    for name, code in _PRIM_FIELDS:
        gbase[code] = acc
        acc += local_counts[name] * n

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(scene_specs, ray_spec, ray_spec),
        out_specs=(ray_spec, ray_spec, ray_spec),
    )
    def sweep(local_scene, ro, rd):
        me = jax.lax.axis_index(axis)
        t = jnp.full(ro.shape[:-1], jnp.inf, ro.dtype)
        ty = jnp.full(ro.shape[:-1], -1, jnp.int32)
        idx = jnp.full(ro.shape[:-1], -1, jnp.int32)
        slot = jnp.full(ro.shape[:-1], jnp.iinfo(jnp.int32).max, jnp.int32)

        def gslot_of(ty, gidx):
            """Global type-major slot id (misses → INT32_MAX)."""
            s = jnp.full_like(gidx, jnp.iinfo(jnp.int32).max)
            for _, code in _PRIM_FIELDS:
                s = jnp.where(ty == code, gbase[code] + gidx, s)
            return s

        for _ in range(n):
            lt, lty, lidx = nearest_hit(local_scene, ro, rd, one_side_planes, "jnp")
            # globalize: shard `me` holds the contiguous index block
            # [me*c_loc, (me+1)*c_loc) of its type
            off = jnp.zeros_like(lidx)
            for name, code in _PRIM_FIELDS:
                if local_counts[name]:
                    off = jnp.where(lty == code, me * local_counts[name], off)
            gidx = lidx + off
            gslot = gslot_of(lty, gidx)
            # exact t-tie → lower global slot wins (= the replicated argmin's
            # first occurrence), independent of ring visit order
            upd = (lt < t) | ((lt == t) & (gslot < slot))
            t = jnp.where(upd, lt, t)
            ty = jnp.where(upd, lty, ty)
            idx = jnp.where(upd, gidx, idx)
            slot = jnp.where(upd, gslot, slot)
            # rotate the tile (and its carry) one hop around the ring
            ro, rd, t, ty, idx, slot = (
                jax.lax.ppermute(x, axis, perm)
                for x in (ro, rd, t, ty, idx, slot)
            )
        return t, ty, idx

    t, ty, idx = jax.jit(sweep)(padded, ro, rd)
    if ray_pad:
        t, ty, idx = t[:R], ty[:R], idx[:R]
    # mask phantom hits on padded slots (parked at _PAD_POS)
    phantom = t >= _T_CAP
    t = jnp.where(phantom, jnp.inf, t)
    ty = jnp.where(phantom, -1, ty)
    idx = jnp.where(phantom, -1, idx)
    return t, ty, idx
