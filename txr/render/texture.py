"""Texture and environment sampling.

Replaces the reference's GL sampler objects (6 sampler2Ds + 1 samplerCube,
rt.frag:136-143) with gather-based bilinear lookups on HBM-resident arrays.

LOD policy (design decision, SURVEY §2.2): the reference picks a mip level
from ``fwidth`` of the UV (rt.frag:326-338, textureLod) with mipmaps built
at texture load (GLWrapper.cpp:319-354).  ``fwidth`` is a screen-space
derivative with no analog for an arbitrary TPU ray batch, so TXR uses a
**ray-footprint LOD**: the world-space width of a pixel's ray cone at the
hit, ``t · pixel_angle / cos θ``, converted to texels with a per-mapping
texels-per-world-unit factor (see ``lod_sphere``/``lod_box``/``lod_ring``),
then trilinear-sampled from a 2×2-box-filtered mip pyramid.  The pyramid is
packed into a single vertically-stacked atlas so the per-ray mip level can
be fully dynamic (elementwise shifts + gathers — no per-level branching).
The CPU oracle implements the identical policy, so forward renders agree.
Cubemap environment lookups stay at level 0 (the reference's load_cubemap,
GLWrapper.cpp:284-317, builds no mips either).

Wrap mode is REPEAT on both axes, matching the reference's scene textures
(GLWrapper::load_texture default wrap, GLWrapper.cpp:319-343; GL_REPEAT is
the GL default).  Cubemaps clamp to edge (GLWrapper.cpp:312-314).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from txr.utils.gather import small_take

_PI = 3.14159265358979  # PI_F, rt.frag:5

MIP_MIN_SIZE = 4   # stop the pyramid when a side would shrink below this
LOD_COS_MIN = 0.125  # grazing-angle footprint growth cap (~GL aniso limit)


@dataclasses.dataclass
class TextureSet:
    """All texture data for a scene.  Registered as a pytree so texture
    contents are differentiable (texture recovery via inverse rendering).

    sphere:  tuple of [H,W,4] float32 RGBA arrays; a sphere's ``texture``
             field n selects sphere[n-1] (rt.frag:330-338; 0 = untextured).
    ring:    [H,W,4] or None — sampled by any textured ring (rt.frag:395-397).
    box:     [H,W,4] or None — sampled by any textured box (rt.frag:428-436).
    cubemap: [6,H,W,4] or None, face order (+x,-x,+y,-y,+z,-z) like the
             reference's load_cubemap face list (main.cpp:137-145).

    atlas2d/cubemap_packed: derived sampling structures filled by
    :func:`with_mips` inside a render (never persisted) — the analog of
    glGenerateMipmap at load (GLWrapper.cpp:343), reorganised for the TPU's
    gather cost model (see PackedAtlas).  ``atlas2d`` is a
    :class:`SceneAtlas`: ONE PackedAtlas holding every 2D scene texture
    (spheres, box, ring — all GL_REPEAT), so a bounce step fetches texels
    for ALL textured hit types in a single pass.  Differentiable: gradients
    flow through the 2×2 box filter and the quad packing back to the
    level-0 arrays.
    """

    sphere: tuple = ()
    ring: object = None
    box: object = None
    cubemap: object = None
    atlas2d: object = None
    cubemap_packed: object = None


jax.tree_util.register_dataclass(
    TextureSet,
    data_fields=["sphere", "ring", "box", "cubemap",
                 "atlas2d", "cubemap_packed"],
    meta_fields=[],
)


@dataclasses.dataclass
class PackedAtlas:
    """Gather-optimised multi-texture mip atlas.

    TPU gathers cost ~90M indices/s regardless of row width (measured,
    v5e), so the sampler's job is to touch as few indices as possible:

    * **Quad packing**: every texel stores its own 2×2 bilinear
      neighbourhood — ``qatlas[y, x] = concat(t[y,x], t[y,x+1], t[y+1,x],
      t[y+1,x+1])`` (neighbours pre-wrapped/clamped) — so one gather yields
      all four bilinear taps.  The lerp math is unchanged, so results are
      bit-identical to the 4-gather form.
    * **One atlas per sampler**: all textures a sampler can select between
      (the sphere texture list, the 6 cubemap faces) live in one
      vertically-stacked array, so per-ray texture selection is index
      arithmetic instead of sample-all-then-select.
    * **Closed-form mip offsets**: levels are exact 2× halvings, so level
      l of a texture with base height H0 starts at row
      ``2·H0 − (2·H0 >> l)`` — no offset-table gather.

    qatlas: [ΣH_atlas, Wmax, 4·C] — per-texture mip pyramids (level 0 first)
            stacked vertically, each level quad-packed.
    base/h0/w0/levels: static per-texture tuples — level-0 row offset,
            level-0 dims, pyramid depth.  Static so they fold into the
            compiled program (the reference bakes texture dims the same
            way: GL samplers carry their size in the object).
    wrap:   "repeat" (GL_REPEAT, scene textures) or "clamp" (cubemap).
    """

    qatlas: object
    base: tuple
    h0: tuple
    w0: tuple
    levels: tuple
    wrap: str = "repeat"


jax.tree_util.register_dataclass(
    PackedAtlas,
    data_fields=["qatlas"],
    meta_fields=["base", "h0", "w0", "levels", "wrap"],
)


def _mip_levels(tex):
    """2×2 box-filtered pyramid (the glGenerateMipmap filter); stops when a
    side would drop below MIP_MIN_SIZE or become odd."""
    levels = [tex]
    while True:
        t = levels[-1]
        H, W = t.shape[0], t.shape[1]
        if H % 2 or W % 2 or H // 2 < MIP_MIN_SIZE or W // 2 < MIP_MIN_SIZE:
            break
        levels.append(t.reshape(H // 2, 2, W // 2, 2, t.shape[-1]).mean(axis=(1, 3)))
    return levels


def _quad_pack(t, wrap):
    """[H,W,C] → [H,W,4C]: each texel bundles its 2×2 bilinear quad."""
    if wrap == "repeat":
        right = jnp.roll(t, -1, axis=1)
        down = jnp.roll(t, -1, axis=0)
        downright = jnp.roll(down, -1, axis=1)
    else:  # clamp to edge
        right = jnp.concatenate([t[:, 1:], t[:, -1:]], axis=1)
        down = jnp.concatenate([t[1:], t[-1:]], axis=0)
        downright = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
    return jnp.concatenate([t, right, down, downright], axis=-1)


def build_packed_atlas(textures, wrap="repeat", mips=True):
    """Pack a list of [H,W,C] textures (+ their mip pyramids) into one
    PackedAtlas."""
    textures = [jnp.asarray(t) for t in textures]
    C = textures[0].shape[-1]
    wmax = max(t.shape[1] for t in textures)
    rows = []
    base, h0, w0, levels = [], [], [], []
    off = 0
    for t in textures:
        lv = _mip_levels(t) if mips else [t]
        base.append(off)
        h0.append(t.shape[0])
        w0.append(t.shape[1])
        levels.append(len(lv))
        for l in lv:
            q = _quad_pack(l, wrap)
            pad_w = wmax - q.shape[1]
            if pad_w:
                q = jnp.concatenate(
                    [q, jnp.zeros((q.shape[0], pad_w, 4 * C), q.dtype)], axis=1
                )
            rows.append(q)
            off += q.shape[0]
    return PackedAtlas(
        qatlas=jnp.concatenate(rows, axis=0),
        base=tuple(base),
        h0=tuple(h0),
        w0=tuple(w0),
        levels=tuple(levels),
        wrap=wrap,
    )


@dataclasses.dataclass
class SceneAtlas:
    """One PackedAtlas over every 2D scene texture + the static slot map:
    sphere texture n occupies slot n−1, then the box texture, then the
    ring texture (slot = None when absent)."""

    pa: PackedAtlas
    n_sphere: int
    box_slot: object = None
    ring_slot: object = None


jax.tree_util.register_dataclass(
    SceneAtlas,
    data_fields=["pa"],
    meta_fields=["n_sphere", "box_slot", "ring_slot"],
)


def with_mips(textures: TextureSet) -> TextureSet:
    """TextureSet with packed sampling atlases built for every texture
    (idempotent).  Runs inside jit at render entry — the glGenerateMipmap
    moment (GLWrapper.cpp:343), re-run per frame so texture gradients flow."""
    if textures.atlas2d is not None or textures.cubemap_packed is not None:
        return textures
    texs = list(textures.sphere)
    n_sphere = len(texs)
    box_slot = ring_slot = None
    if textures.box is not None:
        box_slot = len(texs)
        texs.append(textures.box)
    if textures.ring is not None:
        ring_slot = len(texs)
        texs.append(textures.ring)
    return dataclasses.replace(
        textures,
        atlas2d=(
            SceneAtlas(build_packed_atlas(texs), n_sphere, box_slot, ring_slot)
            if texs
            else None
        ),
        cubemap_packed=(
            None
            if textures.cubemap is None
            else build_packed_atlas(
                [textures.cubemap[f] for f in range(6)], wrap="clamp", mips=False
            )
        ),
    )


def as_rgba(img):
    """[H,W,3|4] uint8/float → [H,W,4] float32 in [0,1]."""
    img = jnp.asarray(img)
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) / 255.0
    img = img.astype(jnp.float32)
    if img.shape[-1] == 3:
        img = jnp.concatenate([img, jnp.ones(img.shape[:-1] + (1,), jnp.float32)], axis=-1)
    return img


def sample_bilinear(tex, uv, wrap="repeat"):
    """GL-style bilinear fetch.  tex [H,W,C], uv [...,2] → [...,C].

    GL texel grid: texel centres at (i+0.5)/W.  Bilinear weights from
    uv*size - 0.5, neighbour indices wrapped (REPEAT) or clamped.
    """
    H, W = tex.shape[0], tex.shape[1]
    u = uv[..., 0] * W - 0.5
    v = uv[..., 1] * H - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    u0 = u0.astype(jnp.int32)
    v0 = v0.astype(jnp.int32)

    if wrap == "repeat":
        wu = lambda i: jnp.mod(i, W)
        wv = lambda i: jnp.mod(i, H)
    else:  # clamp to edge
        wu = lambda i: jnp.clip(i, 0, W - 1)
        wv = lambda i: jnp.clip(i, 0, H - 1)

    c00 = tex[wv(v0), wu(u0)]
    c01 = tex[wv(v0), wu(u0 + 1)]
    c10 = tex[wv(v0 + 1), wu(u0)]
    c11 = tex[wv(v0 + 1), wu(u0 + 1)]
    top = c00 * (1.0 - fu) + c01 * fu
    bot = c10 * (1.0 - fu) + c11 * fu
    return top * (1.0 - fv) + bot * fv


def _meta(pa: PackedAtlas, k):
    """Per-ray texture metadata from the static tuples (select chains fold
    the python constants straight into the program)."""
    take = lambda tup: small_take(jnp.asarray(tup, jnp.int32), k)
    return take(pa.base), take(pa.h0), take(pa.w0), take(pa.levels)


def _fetch_level_packed(pa: PackedAtlas, b, h0, w0, uv, level):
    """Bilinear fetch at mip ``level`` — ONE gather per ray (quad-packed).

    b/h0/w0/level: per-ray int32 arrays.  Bit-identical lerp math to the
    4-gather form (the quad holds exactly the same four texels)."""
    Hl = jnp.right_shift(h0, level)
    Wl = jnp.right_shift(w0, level)
    u = uv[..., 0] * Wl - 0.5
    v = uv[..., 1] * Hl - 0.5
    if pa.wrap == "clamp":
        # clamp the *sample point* into the texel-centre span so the packed
        # edge-duplicated neighbour is always the right one (uv ∈ [0,1])
        u = jnp.clip(u, 0.0, (Wl - 1).astype(u.dtype))
        v = jnp.clip(v, 0.0, (Hl - 1).astype(v.dtype))
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    u0 = u0.astype(jnp.int32)
    v0 = v0.astype(jnp.int32)
    if pa.wrap == "clamp":
        cu = u0
        cv = v0
    else:
        cu = jnp.mod(u0, Wl)
        cv = jnp.mod(v0, Hl)
    # level-l row offset within the texture: levels halve exactly, so
    # Σ_{j<l} H0>>j = 2·H0 − (2·H0 >> l)
    h2 = jnp.left_shift(h0, 1)
    row = b + h2 - jnp.right_shift(h2, level) + cv
    q = pa.qatlas[row, cu]                       # [R, 4C] — the one gather
    C = q.shape[-1] // 4
    c00, c01, c10, c11 = q[..., :C], q[..., C:2 * C], q[..., 2 * C:3 * C], q[..., 3 * C:]
    top = c00 * (1.0 - fu) + c01 * fu
    bot = c10 * (1.0 - fu) + c11 * fu
    return top * (1.0 - fv) + bot * fv


def sample_packed(pa: PackedAtlas, k, uv, lod=None):
    """Texture fetch from a PackedAtlas: the TPU textureLod.

    k: per-ray texture id within the atlas (int32, callers clip);
    uv: [...,2]; lod: per-ray continuous mip level or None (level 0,
    plain bilinear — one gather).  Trilinear costs two gathers total."""
    b, h0, w0, L = _meta(pa, k)
    if lod is None:
        return _fetch_level_packed(pa, b, h0, w0, uv, jnp.zeros_like(b))
    lmax = (L - 1).astype(lod.dtype)
    lod = jnp.clip(lod, 0.0, lmax)
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, L - 1)
    f = (lod - l0.astype(lod.dtype))[..., None]
    c0 = _fetch_level_packed(pa, b, h0, w0, uv, l0)
    c1 = _fetch_level_packed(pa, b, h0, w0, uv, l1)
    return c0 * (1.0 - f) + c1 * f


# -- ray-footprint LOD ------------------------------------------------------
# footprint_world = t · pixel_angle / max(cos θ, LOD_COS_MIN)  (the width of
# the pixel's ray cone where it meets the surface, stretched at grazing
# incidence like GL's max-derivative rule); each mapping converts it to
# texels with its own texels-per-world-unit factor; lod = log2(texels, ≥ 0).
# Callers compute ``fw`` once per ray; samplers apply the per-texture factor
# (textures in one set may have different resolutions).


def _lod_from_texels(texels):
    return jnp.log2(jnp.maximum(texels, 1.0))


def footprint_world(t, cos_in, pix_angle):
    return t * pix_angle / jnp.maximum(cos_in, LOD_COS_MIN)


def lod_sphere(fw, radius, shape0):
    """Spherical mapping: u spans 2π·r of surface per texture repeat, v spans
    π·r  →  texels/world = max(W/2π, H/π)/r (equator-scale estimate).
    shape0 = (H, W): python ints or per-ray int arrays."""
    H, W = shape0
    H = jnp.asarray(H, jnp.float32)
    W = jnp.asarray(W, jnp.float32)
    tpw = jnp.maximum(W / (2.0 * _PI), H / _PI) / jnp.maximum(radius, 1e-6)
    return _lod_from_texels(fw * tpw)


def lod_box(fw, shape0):
    """Triplanar mapping uv = 0.5·p → 0.5 uv-units per world unit."""
    H, W = shape0
    side = jnp.maximum(jnp.asarray(H, jnp.float32), jnp.asarray(W, jnp.float32))
    return _lod_from_texels(fw * 0.5 * side)


def lod_ring(fw, r1_sq, r2_sq, shape0):
    """Annulus mapping u = (ρ² − r1²)/(r2² − r1²), v = cos θ: radial
    texels/world = W·2ρ/(r2²−r1²) at the mid radius ρm; angular ≈ H/(π·ρm)."""
    H, W = shape0
    H = jnp.asarray(H, jnp.float32)
    W = jnp.asarray(W, jnp.float32)
    rm = jnp.sqrt(jnp.maximum(0.5 * (r1_sq + r2_sq), 1e-12))
    tpw = jnp.maximum(
        W * 2.0 * rm / jnp.maximum(r2_sq - r1_sq, 1e-12), H / (_PI * rm)
    )
    return _lod_from_texels(fw * tpw)


def sphere_uv(normal):
    """Spherical UV from the (possibly rotated) unit normal
    (rt.frag:323-325): u = 0.5 + atan2(nz,nx)/2π, v = 0.5 − asin(ny)/π."""
    u = 0.5 + jnp.arctan2(normal[..., 2], normal[..., 0]) / (2.0 * _PI)
    v = 0.5 - jnp.arcsin(jnp.clip(normal[..., 1], -1.0, 1.0)) / _PI
    return jnp.stack([u, v], axis=-1)


def sample_sphere_texture(textures: TextureSet, tex_num, normal, fw=None, radius=None):
    """getSphereTexture (rt.frag:319-340): rotate the normal by the sphere
    quat (done by the caller), spherical UV, then trilinear at the ray-
    footprint LOD (the fwidth-mip replacement) when ``fw`` (footprint_world)
    is given, else plain bilinear.  ``tex_num`` [R] selects among the static
    tuple (callers gate on tex_num != 0, so the 0/out-of-range sample value
    is discarded)."""
    uv = sphere_uv(normal)
    sa = textures.atlas2d
    if sa is not None and sa.n_sphere:
        k = jnp.clip(tex_num - 1, 0, sa.n_sphere - 1)
        lod = None
        if fw is not None:
            _, h0, w0, _ = _meta(sa.pa, k)
            lod = lod_sphere(fw, radius, (h0, w0))
        return sample_packed(sa.pa, k, uv, lod)
    out = jnp.ones(uv.shape[:-1] + (4,), jnp.float32)
    for i, tex in enumerate(textures.sphere):
        c = sample_bilinear(tex, uv)
        out = jnp.where((tex_num == i + 1)[..., None], c, out)
    return out


def box_face_uv(pt, normal, box_pos, box_quat):
    """(uv, weight) of the dominant triplanar face.  The slab normal is an
    exact one-hot in the box frame (rt.frag:422), so the reference's
    |n|-weighted 3-face blend (rt.frag:428-436) reduces to its single
    non-zero term — one texture fetch instead of three.  NOTE the reference
    rotates box.pos by the box quat (not pos-relative) — reproduced
    exactly."""
    from txr.geometry import quaternion as quat

    pos = quat.rotate(box_quat, box_pos)
    p = quat.rotate(box_quat, pt)
    n = quat.rotate(box_quat, normal)
    rel = p - pos
    ax, ay, az = jnp.abs(n[..., 0]), jnp.abs(n[..., 1]), jnp.abs(n[..., 2])
    dom_x = (ax >= ay) & (ax >= az)
    dom_y = jnp.logical_and(~dom_x, ay >= az)
    u = jnp.where(dom_x, rel[..., 2], jnp.where(dom_y, rel[..., 2], rel[..., 0]))
    v = jnp.where(dom_x, rel[..., 1], jnp.where(dom_y, rel[..., 0], rel[..., 1]))
    uv = 0.5 * jnp.stack([u, v], axis=-1) - 0.5
    w = jnp.where(dom_x, ax, jnp.where(dom_y, ay, az))
    return uv, w


def sample_box_texture(textures: TextureSet, pt, normal, box_pos, box_quat, fw=None):
    """getBoxTexture (rt.frag:428-436): dominant-face projection (see
    box_face_uv)."""
    sa = textures.atlas2d
    tex = textures.box
    if sa is not None and sa.box_slot is not None:
        uv, w = box_face_uv(pt, normal, box_pos, box_quat)
        k = jnp.full(uv.shape[:-1], sa.box_slot, jnp.int32)
        lod = lod_box(fw, tex.shape[:2]) if fw is not None else None
        return sample_packed(sa.pa, k, uv, lod) * w[..., None]

    # unpacked fallback: the literal 3-face blend
    from txr.geometry import quaternion as quat

    pos = quat.rotate(box_quat, box_pos)
    p = quat.rotate(box_quat, pt)
    n = quat.rotate(box_quat, normal)

    def face(axes):
        uv = 0.5 * (p[..., axes] - pos[..., axes]) - 0.5
        return sample_bilinear(tex, uv)

    return (
        jnp.abs(n[..., 0:1]) * face((2, 1))    # zy
        + jnp.abs(n[..., 1:2]) * face((2, 0))  # zx
        + jnp.abs(n[..., 2:3]) * face((0, 1))  # xy
    )


def sample_ring_texture(textures: TextureSet, uv, fw=None, r1_sq=None, r2_sq=None):
    """texture(texture_ring, uv) (rt.frag:395-397)."""
    sa = textures.atlas2d
    if sa is not None and sa.ring_slot is not None:
        k = jnp.full(uv.shape[:-1], sa.ring_slot, jnp.int32)
        lod = None
        if fw is not None:
            lod = lod_ring(fw, r1_sq, r2_sq, textures.ring.shape[:2])
        return sample_packed(sa.pa, k, uv, lod)
    return sample_bilinear(textures.ring, uv)


# face layout for GL cubemap lookup (major axis selects the face;
# sc/tc formulas per the GL 3.3 spec §8.13, matching textureCube)
def _cube_face_uv(d):
    """direction [...,3] → (face [...] int32, uv [...,2])."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    is_x = (ax >= ay) & (ax >= az)
    is_y = jnp.logical_and(~is_x, ay >= az)
    # face index: 0:+x 1:-x 2:+y 3:-y 4:+z 5:-z
    face = jnp.where(
        is_x,
        jnp.where(x >= 0, 0, 1),
        jnp.where(is_y, jnp.where(y >= 0, 2, 3), jnp.where(z >= 0, 4, 5)),
    )
    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-20)

    sc = jnp.where(
        is_x,
        jnp.where(x >= 0, -z, z),
        jnp.where(is_y, x, jnp.where(z >= 0, x, -x)),
    )
    tc = jnp.where(is_y, jnp.where(y >= 0, z, -z), -y)

    u = 0.5 * (sc / ma + 1.0)
    v = 0.5 * (tc / ma + 1.0)
    return face, jnp.stack([u, v], axis=-1)


def sample_cubemap(cubemap, d):
    """Environment lookup for direction d [...,3] → RGB [...,3]
    (skybox sample, rt.frag:893).  Sample-all-faces-and-select fallback;
    the hot path is :func:`sample_cubemap_packed`."""
    face, uv = _cube_face_uv(d)
    out = jnp.zeros(d.shape[:-1] + (cubemap.shape[-1],), jnp.float32)
    for f in range(6):
        c = sample_bilinear(cubemap[f], uv, wrap="clamp")
        out = jnp.where((face == f)[..., None], c, out)
    return out[..., :3]


def sample_cubemap_packed(pa: PackedAtlas, d):
    """Environment lookup via the packed 6-face atlas — one gather per ray
    instead of 24 (6 faces × 4 bilinear taps)."""
    face, uv = _cube_face_uv(d)
    return sample_packed(pa, face, uv)[..., :3]


def checkerboard(h=256, w=256, c1=(1.0, 1.0, 1.0), c2=(0.2, 0.2, 0.2), tiles=8):
    """Procedural texture for demos/tests (the reference ships JPEG assets;
    TXR generates its own)."""
    yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    mask = ((yy * tiles // h + xx * tiles // w) % 2).astype(jnp.float32)[..., None]
    c1 = jnp.asarray(c1, jnp.float32)
    c2 = jnp.asarray(c2, jnp.float32)
    rgb = c1 * (1 - mask) + c2 * mask
    return jnp.concatenate([rgb, jnp.ones((h, w, 1), jnp.float32)], axis=-1)
