"""Top-level render entry: rays → trace → supersample-average → image.

The draw-call equivalent of GLWrapper::draw() (GLWrapper.cpp:155-207), with
the SMAA passes replaced by differentiable supersampling: render at
``cfg.supersample``× resolution and box-average — trivially differentiable,
unlike SMAA's LUT searches (design per SURVEY §2.2 / BASELINE.json).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from txr.render.raygen import primary_rays
from txr.render.texture import with_mips
from txr.render.trace import RenderConfig, trace


# screen-tile shape for tiled ray order: 8 rows × 64 cols = 512 lanes =
# one fused-path compaction block (fused._COMPACT_BLOCK), so a compaction
# block is a compact screen rectangle instead of a thin scanline strip —
# textured/glossy/shadow lanes cluster into few blocks.
TILE_H, TILE_W = 8, 64


def _tile_order(x, hs, ws):
    t = x.reshape(hs // TILE_H, TILE_H, ws // TILE_W, TILE_W, x.shape[-1])
    return t.transpose(0, 2, 1, 3, 4).reshape(hs * ws, x.shape[-1])


def _untile_order(x, hs, ws):
    t = x.reshape(hs // TILE_H, ws // TILE_W, TILE_H, TILE_W, x.shape[-1])
    return t.transpose(0, 2, 1, 3, 4).reshape(hs * ws, x.shape[-1])


def render(scene, textures, cfg: RenderConfig):
    """→ image [H, W, 3] float32, row 0 = top."""
    # packed sampling atlases (+ mip pyramids) built once per frame inside
    # jit (glGenerateMipmap analog); hoisted out of the chunk loop by
    # construction.  cfg.texture_lod only controls whether samplers get a
    # ray-footprint LOD — the packed one-gather fetch is used either way.
    textures = with_mips(textures)
    ss = cfg.supersample
    ro, rd = primary_rays(scene.camera, cfg.width, cfg.height, ss)
    hs, ws = cfg.height * ss, cfg.width * ss
    tiled = hs % TILE_H == 0 and ws % TILE_W == 0
    if tiled:
        ro = _tile_order(ro, hs, ws)
        rd = _tile_order(rd, hs, ws)
    if cfg.ray_chunk:
        n = ro.shape[0]
        chunk = cfg.ray_chunk
        pad = (-n) % chunk
        if pad:
            ro = jnp.concatenate([ro, jnp.broadcast_to(ro[-1:], (pad, 3))])
            rd = jnp.concatenate([rd, jnp.broadcast_to(rd[-1:], (pad, 3))])
        ro = ro.reshape(-1, chunk, 3)
        rd = rd.reshape(-1, chunk, 3)
        color = jax.lax.map(
            lambda ord_: trace(scene, textures, cfg, ord_[0], ord_[1]), (ro, rd)
        ).reshape(-1, 3)
        if pad:
            color = color[:n]
    else:
        color = trace(scene, textures, cfg, ro, rd)
    if tiled:
        color = _untile_order(color, hs, ws)
    if ss > 1:
        # [H*ss, W*ss] sample grid, row-major → average each ss×ss block
        img = color.reshape(cfg.height, ss, cfg.width, ss, 3).mean(axis=(1, 3))
    else:
        img = color.reshape(cfg.height, cfg.width, 3)
    return img


def render_debug(scene, textures, cfg: RenderConfig):
    """Primary-hit debug channels — the TPU analog of the reference's DBG
    compile flag that paints intermediate shader values into FragColor
    (rt.frag:151-153, 232-271, 897-901).

    Returns a dict of [H, W, ...] arrays for the primary (bounce-0) hit:
      t       — hit distance (+inf on miss)
      type    — primitive type id (−1 on miss; txr.scene.types.TYPE_*)
      index   — per-type primitive index of the winner
      normal  — shading normal (zeros on miss)
    """
    from txr.render.intersect import nearest_hit
    from txr.render.trace import hit_info

    ro, rd = primary_rays(scene.camera, cfg.width, cfg.height, 1)
    t, ty, idx = nearest_hit(scene, ro, rd, cfg.plane_oneside, cfg.backend)
    hi = hit_info(scene, textures, ro, rd, t, ty, idx)
    hit = jnp.isfinite(t)
    sh = (cfg.height, cfg.width)
    return dict(
        t=t.reshape(sh),
        type=jnp.where(hit, ty, -1).reshape(sh),
        index=jnp.where(hit, idx, -1).reshape(sh),
        normal=jnp.where(hit[..., None], hi["normal"], 0.0).reshape(sh + (3,)),
    )


@functools.partial(jax.jit, static_argnums=(2,))
def render_jit(scene, textures, cfg: RenderConfig):
    """jit'd render — cfg is static, scene/textures are traced pytrees, so
    scene parameter updates (animation, optimisation steps) don't retrace.
    This is the analog of the reference's shader-compile moment
    (GLWrapper::init_shaders, GLWrapper.cpp:232-247): topology and flags
    bake in, parameters stream in per call."""
    return render(scene, textures, cfg)
