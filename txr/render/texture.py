"""Texture and environment sampling.

Replaces the reference's GL sampler objects (6 sampler2Ds + 1 samplerCube,
rt.frag:136-143) with gather-based bilinear lookups on HBM-resident arrays.

LOD policy (design decision, SURVEY §2.2): the reference picks a mip level
from ``fwidth`` of the UV (rt.frag:326-338), a screen-space derivative that
has no analog for an arbitrary ray batch.  TXR samples bilinearly at full
resolution (level 0) and delegates minification anti-aliasing to
supersampling (txr/render/supersample.py), which also replaces SMAA.  The CPU
oracle implements the identical policy, so forward renders agree exactly.

Wrap mode is REPEAT on both axes, matching the reference's scene textures
(GLWrapper::load_texture default wrap, GLWrapper.cpp:319-343; GL_REPEAT is
the GL default).  Cubemaps clamp to edge (GLWrapper.cpp:312-314).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

_PI = 3.14159265358979  # PI_F, rt.frag:5


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
    """

    sphere: tuple = ()
    ring: object = None
    box: object = None
    cubemap: object = None


jax.tree_util.register_dataclass(
    TextureSet, data_fields=["sphere", "ring", "box", "cubemap"], meta_fields=[]
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


def sphere_uv(normal):
    """Spherical UV from the (possibly rotated) unit normal
    (rt.frag:323-325): u = 0.5 + atan2(nz,nx)/2π, v = 0.5 − asin(ny)/π."""
    u = 0.5 + jnp.arctan2(normal[..., 2], normal[..., 0]) / (2.0 * _PI)
    v = 0.5 - jnp.arcsin(jnp.clip(normal[..., 1], -1.0, 1.0)) / _PI
    return jnp.stack([u, v], axis=-1)


def sample_sphere_texture(textures: TextureSet, tex_num, normal):
    """getSphereTexture (rt.frag:319-340) minus the fwidth LOD: rotate the
    normal by the sphere quat (done by the caller), spherical UV, bilinear.
    ``tex_num`` [R] selects among the static tuple; 0/out-of-range → white
    opaque (callers gate on tex_num != 0)."""
    uv = sphere_uv(normal)
    out = jnp.ones(uv.shape[:-1] + (4,), jnp.float32)
    for i, tex in enumerate(textures.sphere):
        c = sample_bilinear(tex, uv)
        out = jnp.where((tex_num == i + 1)[..., None], c, out)
    return out


def sample_box_texture(textures: TextureSet, pt, normal, box_pos, box_quat):
    """Triplanar projection weighted by |normal| in the box frame
    (getBoxTexture, rt.frag:428-436).  NOTE the reference rotates box.pos by
    the box quat (not pos-relative) — reproduced exactly."""
    from txr.geometry import quaternion as quat

    pos = quat.rotate(box_quat, box_pos)
    p = quat.rotate(box_quat, pt)
    n = quat.rotate(box_quat, normal)
    tex = textures.box

    def face(axes):
        uv = 0.5 * (p[..., axes] - pos[..., axes]) - 0.5
        return sample_bilinear(tex, uv)

    return (
        jnp.abs(n[..., 0:1]) * face((2, 1))    # zy
        + jnp.abs(n[..., 1:2]) * face((2, 0))  # zx
        + jnp.abs(n[..., 2:3]) * face((0, 1))  # xy
    )


def sample_ring_texture(textures: TextureSet, uv):
    """texture(texture_ring, uv) (rt.frag:395-397)."""
    return sample_bilinear(textures.ring, uv)


# face layout tables for GL cubemap lookup (major axis selects the face;
# sc/tc formulas per the GL 3.3 spec §8.13, matching textureCube)
def sample_cubemap(cubemap, d):
    """Environment lookup for direction d [...,3] → RGB [...,3]
    (skybox sample, rt.frag:893)."""
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
    uv = jnp.stack([u, v], axis=-1)

    # bilinear within the selected face, clamped (no seam filtering)
    out = jnp.zeros(d.shape[:-1] + (cubemap.shape[-1],), jnp.float32)
    for f in range(6):
        c = sample_bilinear(cubemap[f], uv, wrap="clamp")
        out = jnp.where((face == f)[..., None], c, out)
    return out[..., :3]


def checkerboard(h=256, w=256, c1=(1.0, 1.0, 1.0), c2=(0.2, 0.2, 0.2), tiles=8):
    """Procedural texture for demos/tests (the reference ships JPEG assets;
    TXR generates its own)."""
    yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    mask = ((yy * tiles // h + xx * tiles // w) % 2).astype(jnp.float32)[..., None]
    c1 = jnp.asarray(c1, jnp.float32)
    c2 = jnp.asarray(c2, jnp.float32)
    rgb = c1 * (1 - mask) + c2 * mask
    return jnp.concatenate([rgb, jnp.ones((h, w, 1), jnp.float32)], axis=-1)
