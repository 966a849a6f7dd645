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

# Trilinear lod is clamped to L-1-eps instead of L-1 so the coarse fetch
# level l0+1 is always a real pyramid level (the one-gather block sampler
# reads both levels of the (l0, l0+1) pair from a single packed entry).
# The CPU oracle applies the identical clamp (cpu_reference._trilinear).
BLOCK_LOD_EPS = 1.0 / 1024.0


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
    # alpha-only quad-packed copy of the ring texture for the shadow
    # attenuation fetch (rt.frag:643-651): shadow rays need ONLY alpha, and
    # a 1-channel 1MB table gathers ~4x faster than the full scene atlas
    # (PROFILE_r3.md small-table study).  Values bit-identical to the scene
    # atlas's level-0 alpha (same quantized level 0, same quad-pack lerp).
    ring_alpha_packed: object = None


jax.tree_util.register_dataclass(
    TextureSet,
    data_fields=["sphere", "ring", "box", "cubemap",
                 "atlas2d", "cubemap_packed", "ring_alpha_packed"],
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
    # RGBA8/A8 storage: same texels with channels packed into uint32 rows —
    # C=4 → [H, W, 4] uint32 (one word per quad texel), C=1 → [H,W] uint32
    # (whole quad in one word).  4-16× smaller table ⇒ much faster gathers;
    # values identical by construction (quantize_u8).  Primal-only storage:
    # texture-content grads linearize through qatlas.
    qatlas_u8: object = None


jax.tree_util.register_dataclass(
    PackedAtlas,
    data_fields=["qatlas", "qatlas_u8"],
    meta_fields=["base", "h0", "w0", "levels", "wrap"],
)


def _row_major(tab):
    """Constrain a gather table to row-major layout (no-op where the
    layout API is unavailable).

    Layout assignment otherwise propagates the u8 decode's column
    preference into the gather operand ({1,2,0}), turning each gathered
    row into strided reads — measured 4× slower in-frame (r4 profile;
    pinning bought 41 ms at 1080p).  Use sparingly: row-major tiling of a
    16-word minor dim pads 8× under T(8,128), and per-context padded
    copies OOM'd the backward when every table was pinned."""
    try:
        from jax.experimental.layout import Layout, with_layout_constraint

        return with_layout_constraint(tab, Layout(tuple(range(tab.ndim))))
    except Exception:
        return tab




def quantize_u8(x):
    """RGBA8 storage quantisation — the reference's texture internal format
    (stb_image loads u8; GLWrapper.cpp:339 uploads GL_RGBA) — with a
    straight-through gradient so texture contents stay optimisable.  Values
    become exactly k/255 in f32, which is what the u8-packed atlas stores,
    so the f32 (differentiable) and u8 (fused primal) sampling paths read
    IDENTICAL values.  The f64 oracle mirrors this per mip level."""
    q = jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0
    return x + jax.lax.stop_gradient(q - x)


def mip_down_u8(a, b, c, d, dt):
    """Integer-exact RGBA8 2×2 box downsample: (a+b+c+d+2) >> 2 on the u8
    code values — the only tie-proof formula.  A float mean of four u8
    values is EXACTLY k+0.5 for a quarter of all texel quads, and the f32
    device, the f64 oracle, and the in-gather block reconstruction would
    each break the rounding tie by their own representation noise; integer
    arithmetic is identical everywhere.  Inputs are quantised levels
    (values exactly k/255), output is the next level's f32 values."""
    si = (jnp.round(a * 255.0).astype(jnp.int32)
          + jnp.round(b * 255.0).astype(jnp.int32)
          + jnp.round(c * 255.0).astype(jnp.int32)
          + jnp.round(d * 255.0).astype(jnp.int32))
    return ((si + 2) >> 2).astype(dt) / 255.0


def _mip_levels(tex):
    """2×2 box-filtered pyramid (the glGenerateMipmap filter), every level
    quantised to RGBA8 (GL generates mips in the u8 internal format);
    stops when a side would drop below MIP_MIN_SIZE or become odd.
    Downsampling is integer-exact (mip_down_u8); the straight-through
    payload keeps texture-content gradients flowing via the float mean."""
    levels = [quantize_u8(tex)]
    while True:
        t = levels[-1]
        H, W = t.shape[0], t.shape[1]
        if H % 2 or W % 2 or H // 2 < MIP_MIN_SIZE or W // 2 < MIP_MIN_SIZE:
            break
        r = t.reshape(H // 2, 2, W // 2, 2, t.shape[-1])
        a, b, c, d = r[:, 0, :, 0], r[:, 0, :, 1], r[:, 1, :, 0], r[:, 1, :, 1]
        mean = 0.25 * (a + b + c + d)
        q = mip_down_u8(a, b, c, d, t.dtype)
        levels.append(mean + jax.lax.stop_gradient(q - mean))
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
    qatlas = jnp.concatenate(rows, axis=0)
    qatlas_u8 = None
    if C in (1, 4):
        # values are exactly k/255 post-quantize, so round() is lossless
        u = jnp.round(jax.lax.stop_gradient(qatlas) * 255.0).astype(jnp.uint32)
        u = u.reshape(u.shape[0], u.shape[1], 4, C)
        if C == 4:
            qatlas_u8 = (u[..., 0] | (u[..., 1] << 8) | (u[..., 2] << 16)
                         | (u[..., 3] << 24))                 # [H, W, 4]
        else:
            q4 = u[..., 0]                                    # [H, W, 4]
            qatlas_u8 = (q4[..., 0] | (q4[..., 1] << 8) | (q4[..., 2] << 16)
                         | (q4[..., 3] << 24))                # [H, W]
    return PackedAtlas(
        qatlas=qatlas,
        base=tuple(base),
        h0=tuple(h0),
        w0=tuple(w0),
        levels=tuple(levels),
        wrap=wrap,
        qatlas_u8=qatlas_u8,
    )


@dataclasses.dataclass
class BlockAtlas:
    """One-gather trilinear atlas: mip-PAIR 4×4 block packing.

    The quad-packed PackedAtlas costs 2 gathers per trilinear sample (one
    per mip level).  This layout costs ONE: because every mip level is an
    exact 2×2 box filter of the previous one, a trilinear sample at levels
    (l, l+1) is a pure function of a 4×4 block of *level-l* texels aligned
    to the level-(l+1) grid — the level-l bilinear quad lies inside the
    block (containment: with sample coord x ∈ [0, W_l) and k = ⌊x/2 − ½⌋,
    the quad columns ⌊x−½⌋, ⌊x−½⌋+1 ∈ [2k, 2k+3]), and the level-(l+1)
    quad is the four 2×2 block averages.  So entry (kv, ku) of pair-level
    p = l+1 stores level-l texels rows 2kv..2kv+3 × cols 2ku..2ku+3
    (wrapped/clamped), and one gather + VPU selects/averages reproduce the
    2-gather trilinear bit-for-bit (the averages are the same 2×2 means
    the pyramid build uses).

    qatlas: [ΣHp, Wpmax, 16·C] — per-texture pair-levels p = 1..L stacked
            vertically (pair-level p has grid (H_{p-1}+1)//2 ×
            (W_{p-1}+1)//2; offset of pair-level p within a texture is the
            closed form h0 − (h0 >> (p−1))).
    base/h0/w0/levels: static per-texture tuples as in PackedAtlas.
    clamp:  static per-texture 0/1 tuple — 0 = GL_REPEAT, 1 = clamp-to-edge
            (per-texture, so REPEAT scene textures and the clamped cubemap
            faces share one atlas and one fetch pass).

    Memory: Σ_p (HW >> 2p)·16C = HW·16C/3 — identical to the quad-packed
    mip pyramid's HW·4C·4/3.

    Limitation: REPEAT textures with an odd level-0 side would need a
    non-power-of-two wrap inside a block (the k = −1 block straddles the
    seam at the wrong parity); ``with_mips`` falls back to the quad atlas
    for such texture sets.
    """

    qatlas: object
    base: tuple
    h0: tuple
    w0: tuple
    levels: tuple
    clamp: tuple
    # RGBA8 storage: the same texels with each texel's 4 channels packed
    # into one uint32 → rows are 16 uint32 instead of 64 f32.  4× smaller
    # table; used by the fused path and fast_texels
    # (sample_block(use_u8=True)).  None when C != 4.  Values identical to
    # qatlas by construction (quantize_u8).  Shape [H, W, 16]: the sampler
    # pins it row-major at the gather site (_row_major) — T(8,128) pads the
    # 16-word minor dim, trading 8× padding for contiguous gathered rows
    # (measured faster than a grouped [H, W/8, 128] layout: 94 vs 122 ms
    # frames, r4).
    qatlas_u8: object = None


jax.tree_util.register_dataclass(
    BlockAtlas,
    data_fields=["qatlas", "qatlas_u8"],
    meta_fields=["base", "h0", "w0", "levels", "clamp"],
)


def _block_pack_level(lev, wrap):
    """[H,W,C] level-l texels → [(H+1)//2, (W+1)//2, 16C] pair blocks.

    Entry (kv,ku) = rows 2kv..2kv+3 × cols 2ku..2ku+3 of lev, edges
    wrapped (REPEAT) or duplicated (clamp), row-major over the 16 texels.
    Built with strided slices of an edge-extended copy — no gathers."""
    H, W = lev.shape[0], lev.shape[1]
    Hp, Wp = (H + 1) // 2, (W + 1) // 2
    if wrap == "repeat":
        ext = jnp.concatenate([lev, lev[:3]], axis=0)
        ext = jnp.concatenate([ext, ext[:, :3]], axis=1)
    else:
        ext = jnp.concatenate([lev, jnp.repeat(lev[-1:], 3, axis=0)], axis=0)
        ext = jnp.concatenate([ext, jnp.repeat(ext[:, -1:], 3, axis=1)], axis=1)
    parts = [
        ext[dv : dv + 2 * Hp : 2, du : du + 2 * Wp : 2]
        for dv in range(4)
        for du in range(4)
    ]
    return jnp.concatenate(parts, axis=-1)


def build_block_atlas(textures, wraps, mips=None):
    """Pack textures (+ mip pairs) into one BlockAtlas.  wraps: per-texture
    "repeat"/"clamp"; mips: per-texture bool (False → level 0 only, e.g.
    cubemap faces, GLWrapper.cpp:284-317 builds no cube mips)."""
    textures = [jnp.asarray(t) for t in textures]
    if mips is None:
        mips = [True] * len(textures)
    C = textures[0].shape[-1]
    wpmax = max((t.shape[1] + 1) // 2 for t in textures)
    rows = []
    base, h0, w0, levels, clamp = [], [], [], [], []
    off = 0
    for t, wr, m in zip(textures, wraps, mips):
        lv = _mip_levels(t) if m else [t]
        base.append(off)
        h0.append(t.shape[0])
        w0.append(t.shape[1])
        levels.append(len(lv))
        clamp.append(1 if wr == "clamp" else 0)
        for l in lv:
            q = _block_pack_level(l, wr)
            pad_w = wpmax - q.shape[1]
            if pad_w:
                q = jnp.concatenate(
                    [q, jnp.zeros((q.shape[0], pad_w, 16 * C), q.dtype)], axis=1
                )
            rows.append(q)
            off += q.shape[0]
    qatlas = jnp.concatenate(rows, axis=0)
    qatlas_u8 = None
    if C == 4:
        # pack each texel's RGBA into one uint32 (values are exactly k/255
        # post-quantize, so round() recovers k losslessly) — [H, W, 16]
        u = jnp.round(jax.lax.stop_gradient(qatlas) * 255.0).astype(jnp.uint32)
        u = u.reshape(u.shape[0], u.shape[1], 16, 4)
        qatlas_u8 = (u[..., 0] | (u[..., 1] << 8) | (u[..., 2] << 16)
                     | (u[..., 3] << 24))
    return BlockAtlas(
        qatlas=qatlas,
        base=tuple(base),
        h0=tuple(h0),
        w0=tuple(w0),
        levels=tuple(levels),
        clamp=tuple(clamp),
        qatlas_u8=qatlas_u8,
    )


def _sel4_rows(blk, i):
    """blk [...,4,4,C], i [...] ∈ 0..3 → blk[..., i, :, :]  (where-chain)."""
    out = blk[..., 0, :, :]
    for j in range(1, 4):
        out = jnp.where((i == j)[..., None, None], blk[..., j, :, :], out)
    return out


def _sel4_cols(row, i):
    """row [...,4,C], i [...] ∈ 0..3 → row[..., i, :]."""
    out = row[..., 0, :]
    for j in range(1, 4):
        out = jnp.where((i == j)[..., None], row[..., j, :], out)
    return out


def sample_block(ba: BlockAtlas, k, uv, lod=None, use_u8=False):
    """Trilinear (or bilinear when lod is None/0) fetch — ONE gather per ray.

    Matches sample_packed's 2-gather trilinear except lod is clamped to
    L−1−BLOCK_LOD_EPS (mirrored in the CPU oracle).

    use_u8: gather the RGBA8-packed storage (16 uint32 rows instead of 64
    f32 — ~3× the gather throughput) and unpack on the VPU.  Identical
    values (quantize_u8); no texture-content gradients, so only the
    forward-only fused path uses it."""
    b, h0, w0, L = _meta(ba, k)
    is_clamp = small_take(jnp.asarray(ba.clamp, jnp.int32), k) == 1
    dt = uv.dtype
    if lod is None:
        lod = jnp.zeros(k.shape, dt)
    lmax = jnp.maximum((L - 1).astype(dt) - BLOCK_LOD_EPS, 0.0)
    lod = jnp.clip(lod, 0.0, lmax)
    l0 = lod.astype(jnp.int32)
    f = (lod - l0.astype(dt))[..., None]
    Hl = jnp.right_shift(h0, l0)
    Wl = jnp.right_shift(w0, l0)
    Hl1 = jnp.maximum(jnp.right_shift(Hl, 1), 1)
    Wl1 = jnp.maximum(jnp.right_shift(Wl, 1), 1)
    Hp = jnp.right_shift(Hl + 1, 1)
    Wp = jnp.right_shift(Wl + 1, 1)

    def coords(c, nl, np_, nl1):
        """Per-axis index math.  Returns (grid index into the pair level,
        level-l0 tap-0 local offset ∈ {0,1,2}, level-l0 frac,
        level-l1 tap-1 local offset ∈ {0,1}, level-l1 frac)."""
        nlf = nl.astype(dt)
        s = jnp.where(
            is_clamp,
            jnp.clip(c * nlf, 0.0, nlf),
            (c - jnp.floor(c)) * nlf,
        )
        c0 = s - 0.5
        c0 = jnp.where(is_clamp, jnp.clip(c0, 0.0, (nl - 1).astype(dt)), c0)
        t0 = jnp.floor(c0)
        f0 = c0 - t0
        c1 = 0.5 * s - 0.5
        c1 = jnp.where(is_clamp, jnp.clip(c1, 0.0, (nl1 - 1).astype(dt)), c1)
        kf = jnp.floor(c1)
        f1 = c1 - kf
        kk = kf.astype(jnp.int32)
        t_loc = jnp.clip(t0.astype(jnp.int32) - 2 * kk, 0, 2)
        grid = jnp.where(is_clamp, kk, jnp.remainder(kk, np_))
        b_loc = jnp.where(is_clamp & (kk + 1 > nl1 - 1), 0, 1)
        return grid, t_loc, f0[..., None], b_loc, f1[..., None]

    gu, tu, fu, bu, fu1 = coords(uv[..., 0], Wl, Wp, Wl1)
    gv, tv, fv, bv, fv1 = coords(uv[..., 1], Hl, Hp, Hl1)

    # pair-level p = l0+1 row offset within the texture: h0 − (h0 >> l0)
    row = b + (h0 - jnp.right_shift(h0, l0)) + gv
    if use_u8 and ba.qatlas_u8 is not None:
        # Flat channel-wise decode: select the needed packed words FIRST,
        # then unpack — every op stays [R]-shaped, so XLA fuses the whole
        # tail into the gather's consumer instead of materialising
        # [R,16,4]/[R,4,4,4] intermediates (measured ~10 ms per full-width
        # 512K pass for the reshaping form — scripts/fetch_decomp.py).
        # Values are bit-identical to the f32 branch below by construction.
        # The row-major pin goes adjacent to the gather (it does NOT
        # survive loop/cond boundaries from further away — measured); this
        # is the ONE pinned table — pinning the f32/cubemap tables too gave
        # the backward a padded copy per cond context and OOM'd the chip.
        qi = _row_major(ba.qatlas_u8)[row, gu]   # [..., 16] uint32
        w = [qi[..., j] for j in range(16)]

        def sel16(widx):
            out = w[0]
            for j in range(1, 16):
                out = jnp.where(widx == j, w[j], out)
            return out

        def unpack(word):
            return [((word >> jnp.uint32(s)) & jnp.uint32(0xFF)).astype(dt)
                    / 255.0 for s in (0, 8, 16, 24)]

        fu_s, fv_s = fu[..., 0], fv[..., 0]
        fu1_s, fv1_s = fu1[..., 0], fv1[..., 0]
        f_s = f[..., 0]
        t00 = unpack(sel16(tv * 4 + tu))
        t01 = unpack(sel16(tv * 4 + tu + 1))
        t10 = unpack(sel16(tv * 4 + tu + 4))
        t11 = unpack(sel16(tv * 4 + tu + 5))
        # level-(l0+1) quad = integer-exact 2×2 means (mip_down_u8 on the
        # extracted u8 codes — identical to the stored pyramid level)
        wi = [[((w[4 * r + c] >> jnp.uint32(s)) & jnp.uint32(0xFF))
               .astype(jnp.int32) for s in (0, 8, 16, 24)]
              for r in range(4) for c in range(4)]

        def mean4(i00, i01, i10, i11):
            return [((wi[i00][ch] + wi[i01][ch] + wi[i10][ch] + wi[i11][ch]
                      + 2) >> 2).astype(dt) / 255.0 for ch in range(4)]

        m00 = mean4(0, 1, 4, 5)
        m01 = mean4(2, 3, 6, 7)
        m10 = mean4(8, 9, 12, 13)
        m11 = mean4(10, 11, 14, 15)
        bu1 = bu == 1
        bv1 = bv == 1
        out_ch = []
        for ch in range(4):
            lo_c = (t00[ch] * (1 - fu_s) + t01[ch] * fu_s) * (1 - fv_s) + (
                t10[ch] * (1 - fu_s) + t11[ch] * fu_s) * fv_s
            d00 = m00[ch]
            d01 = jnp.where(bu1, m01[ch], d00)
            d10 = jnp.where(bv1, m10[ch], d00)
            d11 = jnp.where(
                bv1,
                jnp.where(bu1, m11[ch], m10[ch]),
                jnp.where(bu1, m01[ch], d00),
            )
            hi_c = (d00 * (1 - fu1_s) + d01 * fu1_s) * (1 - fv1_s) + (
                d10 * (1 - fu1_s) + d11 * fu1_s) * fv1_s
            out_ch.append(lo_c * (1 - f_s) + hi_c * f_s)
        return jnp.stack(out_ch, axis=-1)
    else:
        q = ba.qatlas[row, gu]                              # the ONE gather
        blk = q.reshape(q.shape[:-1] + (4, 4, q.shape[-1] // 16))

    # level-l0 bilinear quad (selects within the block)
    ra = _sel4_rows(blk, tv)
    rb = _sel4_rows(blk, tv + 1)
    c00 = _sel4_cols(ra, tu)
    c01 = _sel4_cols(ra, tu + 1)
    c10 = _sel4_cols(rb, tu)
    c11 = _sel4_cols(rb, tu + 1)
    lo = (c00 * (1 - fu) + c01 * fu) * (1 - fv) + (c10 * (1 - fu) + c11 * fu) * fv

    # level-l1 quad = the four 2×2 block means, via the pyramid's own
    # integer-exact filter (mip_down_u8) so the one-gather reconstruction
    # equals the stored level l0+1 bit-for-bit
    a_ = blk[..., 0::2, 0::2, :]
    b_ = blk[..., 0::2, 1::2, :]
    c_ = blk[..., 1::2, 0::2, :]
    d_ = blk[..., 1::2, 1::2, :]
    mean_ = 0.25 * (a_ + b_ + c_ + d_)
    q_ = mip_down_u8(a_, b_, c_, d_, dt)
    m = mean_ + jax.lax.stop_gradient(q_ - mean_)            # [...,2,2,C]
    d00 = m[..., 0, 0, :]
    d01 = jnp.where((bu == 1)[..., None], m[..., 0, 1, :], d00)
    d10 = jnp.where((bv == 1)[..., None], m[..., 1, 0, :], d00)
    d11 = jnp.where(
        (bv == 1)[..., None],
        jnp.where((bu == 1)[..., None], m[..., 1, 1, :], m[..., 1, 0, :]),
        jnp.where((bu == 1)[..., None], m[..., 0, 1, :], d00),
    )
    hi = (d00 * (1 - fu1) + d01 * fu1) * (1 - fv1) + (
        d10 * (1 - fu1) + d11 * fu1
    ) * fv1

    return lo * (1 - f) + hi * f


def _sample_atlas_raw(pa, k, uv, lod, use_u8):
    """Dispatch: BlockAtlas (one gather) or PackedAtlas (1-2 gathers)."""
    if isinstance(pa, BlockAtlas):
        return sample_block(pa, k, uv, lod, use_u8=use_u8)
    return sample_packed(pa, k, uv, lod, use_u8=use_u8)


def sample_atlas(pa, k, uv, lod=None, use_u8=False):
    """Texture fetch from either atlas flavour.

    ``use_u8`` gathers the uint32-packed storage (4× smaller table, much
    faster — the fast_texels path) through a custom VJP so EVERY gradient
    survives, including texture content (ADVICE r4: the bare u8 decode is
    integer, so it silently zeroed content grads): the u8 and f32 atlases
    store identical values (quantize_u8), so the u8 primal is exact and
    the backward may linearise wherever convenient — uv/lod cotangents
    come from re-differentiating the u8 decode (no extra table gather);
    the content cotangent linearises through the f32 atlas, and its whole
    chain (one f32 gather + transpose scatter) is DCE'd by XLA whenever
    the caller doesn't differentiate w.r.t. textures."""
    if not use_u8:
        return _sample_atlas_raw(pa, k, uv, lod, False)
    if lod is None:
        return _sample_atlas_u8(pa, k, uv)
    return _sample_atlas_u8_lod(pa, k, uv, lod)


@jax.custom_vjp
def _sample_atlas_u8(pa, k, uv):
    return _sample_atlas_raw(pa, k, uv, None, True)


def _sample_atlas_u8_fwd(pa, k, uv):
    return _sample_atlas_u8(pa, k, uv), (pa, k, uv)


def _sample_atlas_u8_bwd(res, g):
    pa, k, uv = res
    _, vjp_uv = jax.vjp(lambda uv_: _sample_atlas_raw(pa, k, uv_, None, True), uv)
    (guv,) = vjp_uv(g)
    _, vjp_pa = jax.vjp(lambda pa_: _sample_atlas_raw(pa_, k, uv, None, False), pa)
    (gpa,) = vjp_pa(g)
    return gpa, None, guv


_sample_atlas_u8.defvjp(_sample_atlas_u8_fwd, _sample_atlas_u8_bwd)


@jax.custom_vjp
def _sample_atlas_u8_lod(pa, k, uv, lod):
    return _sample_atlas_raw(pa, k, uv, lod, True)


def _sample_atlas_u8_lod_fwd(pa, k, uv, lod):
    return _sample_atlas_u8_lod(pa, k, uv, lod), (pa, k, uv, lod)


def _sample_atlas_u8_lod_bwd(res, g):
    pa, k, uv, lod = res
    _, vjp_uv = jax.vjp(
        lambda uv_, lod_: _sample_atlas_raw(pa, k, uv_, lod_, True), uv, lod)
    guv, glod = vjp_uv(g)
    _, vjp_pa = jax.vjp(lambda pa_: _sample_atlas_raw(pa_, k, uv, lod, False), pa)
    (gpa,) = vjp_pa(g)
    return gpa, None, guv, glod


_sample_atlas_u8_lod.defvjp(_sample_atlas_u8_lod_fwd, _sample_atlas_u8_lod_bwd)


@dataclasses.dataclass
class SceneAtlas:
    """One atlas over every texture a frame can touch + the static slot
    map: sphere texture n occupies slot n−1, then the box texture, then
    the ring texture, then the 6 cubemap faces (cube_base = face-0 slot;
    None when absent).  With the cubemap merged in, a bounce step's miss
    (environment) rays and textured-hit rays are served by ONE fetch."""

    pa: object
    n_sphere: int
    box_slot: object = None
    ring_slot: object = None
    cube_base: object = None


jax.tree_util.register_dataclass(
    SceneAtlas,
    data_fields=["pa"],
    meta_fields=["n_sphere", "box_slot", "ring_slot", "cube_base"],
)


def with_mips(textures: TextureSet) -> TextureSet:
    """TextureSet with packed sampling atlases built for every texture
    (idempotent).  Runs inside jit at render entry — the glGenerateMipmap
    moment (GLWrapper.cpp:343), re-run per frame so texture gradients flow.

    Preferred layout: ONE BlockAtlas over scene textures + cubemap faces
    (one gather per trilinear sample, one fetch pass per bounce step).
    Falls back to the 2-gather quad atlases when a REPEAT texture has an
    odd side (see BlockAtlas limitation)."""
    if textures.atlas2d is not None or textures.cubemap_packed is not None:
        return textures
    if textures.ring is not None:
        textures = dataclasses.replace(
            textures,
            ring_alpha_packed=build_packed_atlas(
                [quantize_u8(textures.ring)[..., 3:4]], wrap="repeat",
                mips=False),
        )
    texs = list(textures.sphere)
    n_sphere = len(texs)
    box_slot = ring_slot = cube_base = None
    if textures.box is not None:
        box_slot = len(texs)
        texs.append(textures.box)
    if textures.ring is not None:
        ring_slot = len(texs)
        texs.append(textures.ring)
    n_2d = len(texs)
    odd_repeat = any(
        (jnp.shape(t)[0] % 2) or (jnp.shape(t)[1] % 2) for t in texs
    )
    if not odd_repeat:
        # The cubemap deliberately stays OUT of the scene atlas: environment
        # fetches are deferred to one post-loop pass (trace.initial_state),
        # and a standalone 6-face atlas is a SMALL table — measured ~4x the
        # gather throughput of the big 2D atlas (scripts/gather_bench.py:
        # 430 vs ~60-150 Mrows/s).  Merging it (r2's design) only paid when
        # env shared the per-step fetch.
        wraps = ["repeat"] * n_2d
        mips = [True] * n_2d
        return dataclasses.replace(
            textures,
            atlas2d=(
                SceneAtlas(build_block_atlas(texs, wraps, mips), n_sphere,
                           box_slot, ring_slot, None)
                if texs
                else None
            ),
            cubemap_packed=(
                None
                if textures.cubemap is None
                else build_packed_atlas(
                    [quantize_u8(textures.cubemap[f]) for f in range(6)],
                    wrap="clamp", mips=False
                )
            ),
        )
    return dataclasses.replace(
        textures,
        atlas2d=(
            SceneAtlas(build_packed_atlas(texs[:n_2d]), n_sphere,
                       box_slot, ring_slot)
            if n_2d
            else None
        ),
        cubemap_packed=(
            None
            if textures.cubemap is None
            else build_packed_atlas(
                [quantize_u8(textures.cubemap[f]) for f in range(6)],
                wrap="clamp", mips=False
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


def _fetch_level_packed(pa: PackedAtlas, b, h0, w0, uv, level, use_u8=False):
    """Bilinear fetch at mip ``level`` — ONE gather per ray (quad-packed).

    b/h0/w0/level: per-ray int32 arrays.  Bit-identical lerp math to the
    4-gather form (the quad holds exactly the same four texels).

    use_u8: gather the uint32-packed storage (4 words for C=4, ONE word for
    C=1) — a 4-16× smaller table gathers far faster (small-table regime);
    values identical (quantize_u8).  Forward-only (no content grads)."""
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
    dt = uv.dtype
    if use_u8 and pa.qatlas_u8 is not None:
        unpack = lambda w: jnp.stack(
            [((w >> jnp.uint32(s)) & jnp.uint32(0xFF)).astype(dt) / 255.0
             for s in (0, 8, 16, 24)], axis=-1)
        qi = pa.qatlas_u8[row, cu]               # [R, 4] or [R] uint32
        if qi.ndim == row.ndim:                  # C == 1: quad in one word
            a4 = unpack(qi)                      # [R, 4] = the four taps
            c00, c01, c10, c11 = (a4[..., i : i + 1] for i in range(4))
        else:                                    # C == 4: word per texel
            c00, c01, c10, c11 = (unpack(qi[..., i]) for i in range(4))
    else:
        q = pa.qatlas[row, cu]                   # [R, 4C] — the one gather
        C = q.shape[-1] // 4
        c00, c01, c10, c11 = (q[..., :C], q[..., C:2 * C],
                              q[..., 2 * C:3 * C], q[..., 3 * C:])
    top = c00 * (1.0 - fu) + c01 * fu
    bot = c10 * (1.0 - fu) + c11 * fu
    return top * (1.0 - fv) + bot * fv


def sample_packed(pa: PackedAtlas, k, uv, lod=None, use_u8=False):
    """Texture fetch from a PackedAtlas: the TPU textureLod.

    k: per-ray texture id within the atlas (int32, callers clip);
    uv: [...,2]; lod: per-ray continuous mip level or None (level 0,
    plain bilinear — one gather).  Trilinear costs two gathers total."""
    b, h0, w0, L = _meta(pa, k)
    if lod is None:
        return _fetch_level_packed(pa, b, h0, w0, uv, jnp.zeros_like(b),
                                   use_u8=use_u8)
    # Same BLOCK_LOD_EPS clamp as sample_block so device (either atlas
    # flavour) and the f64 oracle agree exactly at max LOD (ADVICE r2).
    lmax = jnp.maximum((L - 1).astype(lod.dtype) - BLOCK_LOD_EPS, 0.0)
    lod = jnp.clip(lod, 0.0, lmax)
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, L - 1)
    f = (lod - l0.astype(lod.dtype))[..., None]
    c0 = _fetch_level_packed(pa, b, h0, w0, uv, l0, use_u8=use_u8)
    c1 = _fetch_level_packed(pa, b, h0, w0, uv, l1, use_u8=use_u8)
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
        return sample_atlas(sa.pa, k, uv, lod)
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
        return sample_atlas(sa.pa, k, uv, lod) * w[..., None]

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


def sample_ring_texture(textures: TextureSet, uv, fw=None, r1_sq=None, r2_sq=None,
                        use_u8=False):
    """texture(texture_ring, uv) (rt.frag:395-397)."""
    sa = textures.atlas2d
    if sa is not None and sa.ring_slot is not None:
        k = jnp.full(uv.shape[:-1], sa.ring_slot, jnp.int32)
        lod = None
        if fw is not None:
            lod = lod_ring(fw, r1_sq, r2_sq, textures.ring.shape[:2])
        return sample_atlas(sa.pa, k, uv, lod, use_u8=use_u8)
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


@jax.custom_vjp
def sample_packed_fast(pa, k, uv):
    """u8-primal level-0 PackedAtlas fetch whose backward recomputes the
    f32 sampler.

    The u8 and f32 atlases store IDENTICAL values (quantize_u8), so the
    primal is exact and the f32 recompute linearises at the same point —
    content/uv gradients are untouched while the forward pays the 4-16×
    smaller table's gather rate (small-table regime, PROFILE_r3.md)."""
    return sample_packed(pa, k, uv, None, use_u8=True)


def _sample_packed_fast_fwd(pa, k, uv):
    return sample_packed_fast(pa, k, uv), (pa, k, uv)


def _sample_packed_fast_bwd(res, g):
    pa, k, uv = res
    _, vjp = jax.vjp(lambda pa_, uv_: sample_packed(pa_, k, uv_), pa, uv)
    gpa, guv = vjp(g)
    return gpa, None, guv


sample_packed_fast.defvjp(_sample_packed_fast_fwd, _sample_packed_fast_bwd)


def sample_cubemap_packed(pa: PackedAtlas, d):
    """Environment lookup via the packed 6-face atlas — one gather per ray
    instead of 24 (6 faces × 4 bilinear taps).  Uses the u8 storage when
    present (same values, ~4× the gather rate — the env pass is full-width,
    PROFILE_r3.md)."""
    face, uv = _cube_face_uv(d)
    if pa.qatlas_u8 is not None:
        return sample_packed_fast(pa, face, uv)[..., :3]
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
