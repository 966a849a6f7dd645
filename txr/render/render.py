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


def _chunked_trace(scene, textures, cfg: RenderConfig, ro, rd):
    """trace() under the cfg.ray_chunk memory bound: a lax.map over
    fixed-size ray chunks, so HBM holds one chunk's [rays × primitives]
    intermediates at a time.  Shared by the base pass and the edge-AA
    re-render (both can exceed the envelope at 1080p)."""
    if cfg.ray_chunk and ro.shape[0] > cfg.ray_chunk:
        n = ro.shape[0]
        chunk = cfg.ray_chunk
        pad = (-n) % chunk
        if pad:
            ro = jnp.concatenate([ro, jnp.broadcast_to(ro[-1:], (pad, 3))])
            rd = jnp.concatenate([rd, jnp.broadcast_to(rd[-1:], (pad, 3))])
        color = jax.lax.map(
            lambda ord_: trace(scene, textures, cfg, ord_[0], ord_[1]),
            (ro.reshape(-1, chunk, 3), rd.reshape(-1, chunk, 3)),
        ).reshape(-1, 3)
        return color[:n] if pad else color
    return trace(scene, textures, cfg, ro, rd)


def render(scene, textures, cfg: RenderConfig):
    """→ image [H, W, 3] float32, row 0 = top."""
    # packed sampling atlases (+ mip pyramids) built once per frame inside
    # jit (glGenerateMipmap analog); hoisted out of the chunk loop by
    # construction.  cfg.texture_lod only controls whether samplers get a
    # ray-footprint LOD — the packed one-gather fetch is used either way.
    textures = with_mips(textures)
    if cfg.aa_mode == "edge" and cfg.supersample > 1:
        import dataclasses

        base = render(scene, textures,
                      dataclasses.replace(cfg, supersample=1))
        return _edge_aa(scene, textures, cfg, base)
    ss = cfg.supersample
    ro, rd = primary_rays(scene.camera, cfg.width, cfg.height, ss)
    hs, ws = cfg.height * ss, cfg.width * ss
    tiled = hs % TILE_H == 0 and ws % TILE_W == 0
    if tiled:
        ro = _tile_order(ro, hs, ws)
        rd = _tile_order(rd, hs, ws)
    color = _chunked_trace(scene, textures, cfg, ro, rd)
    if tiled:
        color = _untile_order(color, hs, ws)
    if ss > 1:
        # [H*ss, W*ss] sample grid, row-major → average each ss×ss block
        img = color.reshape(cfg.height, ss, cfg.width, ss, 3).mean(axis=(1, 3))
    else:
        img = color.reshape(cfg.height, cfg.width, 3)
    return img


def _edge_aa(scene, textures, cfg: RenderConfig, base):
    """Edge-adaptive AA: re-render ONLY luma-edge pixels at k² spp and
    composite over the 1-spp frame.

    The reference ships SMAA ULTRA (main.cpp:32): a post-process that finds
    luma edges (SMAA.h:689) and blends along them — its cost model is
    "pay only at edges".  The SSAA replacement (SURVEY §2.2) paid k²×
    everywhere; this pass restores the SMAA cost model with SSAA's quality:
    the k² sub-rays reuse the exact SSAA sub-pixel grid (raygen.pixel_grid
    convention), so a re-rendered pixel equals its uniform-SSAA value.

    Differentiable: base and re-render both carry gradients; the edge mask
    and pixel selection are detached (piecewise constant in parameters,
    the argmin argument).  Pixels beyond the static budget keep 1 spp.
    """
    import jax

    from txr.render.raygen import ray_dirs

    k = cfg.supersample
    H, W = cfg.height, cfg.width
    lum = jnp.tensordot(
        jax.lax.stop_gradient(base),
        jnp.asarray([0.2126, 0.7152, 0.0722], base.dtype), axes=1)
    # neighbour luma deltas (left/right/up/down), borders excluded — the
    # luma edge detect of SMAALumaEdgeDetectionPS (SMAA.h:689) made
    # symmetric so BOTH sides of a discontinuity re-render
    z = jnp.zeros((1, W), lum.dtype)
    zc = jnp.zeros((H, 1), lum.dtype)
    dv = jnp.abs(lum[1:] - lum[:-1])
    dh = jnp.abs(lum[:, 1:] - lum[:, :-1])
    d_up = jnp.concatenate([z, dv], axis=0)
    d_dn = jnp.concatenate([dv, z], axis=0)
    d_lf = jnp.concatenate([zc, dh], axis=1)
    d_rt = jnp.concatenate([dh, zc], axis=1)
    edge = jnp.maximum(jnp.maximum(d_up, d_dn),
                       jnp.maximum(d_lf, d_rt)) > cfg.edge_threshold
    edge_flat = edge.reshape(-1)

    K = min(H * W, cfg.edge_budget_mult * (H + W))
    pix = jnp.nonzero(edge_flat, size=K, fill_value=H * W)[0]
    safe = jnp.minimum(pix, H * W - 1)
    r = safe // W
    c = safe % W
    # the k×k sub-grid of pixel (r, c) in gl_FragCoord convention — exactly
    # pixel_grid(ss=k)'s samples for that pixel, so edge pixels match the
    # uniform-SSAA image
    jj = jnp.arange(k * k)
    jx = (jj % k).astype(base.dtype)
    jy = (jj // k).astype(base.dtype)
    x = c[:, None].astype(base.dtype) + (jx[None, :] + 0.5) / k
    y = (H - r[:, None]).astype(base.dtype) - (jy[None, :] + 0.5) / k
    rd = ray_dirs(scene.camera.quat, x, y, W, H).reshape(-1, 3)
    ro = jnp.broadcast_to(scene.camera.pos, rd.shape)
    col = _chunked_trace(scene, textures, cfg, ro, rd)
    aa = col.reshape(K, k * k, 3).mean(axis=1)
    out = base.reshape(-1, 3).at[pix].set(aa, mode="drop")
    return out.reshape(H, W, 3)


def render_debug(scene, textures, cfg: RenderConfig, bounce: int = 0):
    """Per-bounce debug channels — the TPU analog of the reference's DBG
    compile flag that paints intermediate shader values into FragColor at
    any chosen iteration, first-write-wins (rt.frag:151-153, 232-271,
    897-901).

    ``bounce`` selects the step: 0 = the primary hit; k > 0 advances the
    real bounce loop k steps (same step body as render()) and reports the
    state of the rays *entering* step k.

    Returns a dict of [H, W, ...] arrays:
      t       — hit distance of step k's nearest hit (+inf on miss)
      type    — primitive type id (−1 on miss; txr.scene.types.TYPE_*)
      index   — per-type primitive index of the winner
      normal  — shading normal at the step-k hit (zeros on miss)
      mask    — the ray's accumulated throughput mask entering step k
      alive   — whether the ray is still tracing at step k
    """
    import dataclasses

    from txr.render.intersect import nearest_hit
    from txr.render.trace import hit_info, initial_state, make_step

    textures = with_mips(textures)
    ro0, rd0 = primary_rays(scene.camera, cfg.width, cfg.height, 1)
    st = initial_state(ro0, rd0)
    if bounce > 0:
        # ungated step body: the debug dump must not skip dead-batch steps,
        # and tiny debug resolutions sit below the compaction thresholds
        dbg_cfg = dataclasses.replace(cfg, gating=False)
        body = make_step(scene, textures, dbg_cfg)
        for _ in range(bounce):
            st = body(st)
    ro, rd = st["ro"], st["rd"]
    t, ty, idx = nearest_hit(scene, ro, rd, cfg.plane_oneside, cfg.backend)
    hi = hit_info(scene, textures, ro, rd, t, ty, idx)
    hit = jnp.isfinite(t) & st["alive"]
    sh = (cfg.height, cfg.width)
    return dict(
        t=jnp.where(hit, t, jnp.inf).reshape(sh),
        type=jnp.where(hit, ty, -1).reshape(sh),
        index=jnp.where(hit, idx, -1).reshape(sh),
        normal=jnp.where(hit[..., None], hi["normal"], 0.0).reshape(sh + (3,)),
        mask=st["mask"].reshape(sh + (3,)),
        alive=st["alive"].reshape(sh),
    )


@functools.partial(jax.jit, static_argnums=(2,))
def render_jit(scene, textures, cfg: RenderConfig):
    """jit'd render — cfg is static, scene/textures are traced pytrees, so
    scene parameter updates (animation, optimisation steps) don't retrace.
    This is the analog of the reference's shader-compile moment
    (GLWrapper::init_shaders, GLWrapper.cpp:232-247): topology and flags
    bake in, parameters stream in per call."""
    return render(scene, textures, cfg)
