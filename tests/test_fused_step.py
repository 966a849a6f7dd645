"""The fused step-probe path must reproduce the jnp bounce loop.

Runs the full demo scene (every primitive type, textures, ring alpha,
glass sphere, cubemap) through both bodies at tiny resolution — interpret
mode makes the Pallas kernel exact-math on CPU, so the comparison is tight.
"""

import dataclasses

import numpy as np
import jax

from txr.apps.demo import build_scene, demo_textures
from txr.render.render import render
from txr.render.trace import RenderConfig


def _cfgs(**kw):
    base = RenderConfig(width=32, height=18, iterations=3,
                        extra_refraction_steps=2, **kw)
    return base, dataclasses.replace(base, fused="off")


def _assert_golden_close(img_f, img_j, msg=""):
    """The repo's golden criterion (bench.py gate): the two backends'
    sweeps differ in last-bit root placement at silhouette/torus pixels, so
    a small pixel-fraction tolerance is the correct equality notion."""
    assert np.isfinite(img_f).all(), msg
    diff = np.abs(img_f - img_j).max(axis=-1)
    frac = float((diff > 2e-3).mean())
    assert frac <= 0.015, f"{msg}: {frac:.3%} pixels over tol (max {diff.max():.4f})"
    assert float(diff.max()) < 0.1, f"{msg}: max diff {diff.max():.4f}"


def test_fused_matches_jnp_demo():
    scene, _ = build_scene(32, 18)
    textures = demo_textures()
    cfg_f, cfg_j = _cfgs(fused="on")
    img_f = np.asarray(jax.jit(lambda s: render(s, textures, cfg_f))(scene))
    img_j = np.asarray(jax.jit(lambda s: render(s, textures, cfg_j))(scene))
    _assert_golden_close(img_f, img_j, "demo")


def test_fused_matches_jnp_no_textures():
    from txr.render.texture import TextureSet

    scene, _ = build_scene(32, 18)
    textures = TextureSet()
    cfg_f, cfg_j = _cfgs(fused="on")
    img_f = np.asarray(jax.jit(lambda s: render(s, textures, cfg_f))(scene))
    img_j = np.asarray(jax.jit(lambda s: render(s, textures, cfg_j))(scene))
    _assert_golden_close(img_f, img_j, "no-textures")


def test_fused_matches_jnp_flags():
    """Flag variants: shadows off, LOD off, gating off."""
    scene, _ = build_scene(32, 18)
    textures = demo_textures()
    for kw in (dict(shadow_enabled=False), dict(texture_lod=False),
               dict(gating=False)):
        cfg_f, cfg_j = _cfgs(fused="on", **kw)
        img_f = np.asarray(jax.jit(lambda s: render(s, textures, cfg_f))(scene))
        img_j = np.asarray(jax.jit(lambda s: render(s, textures, cfg_j))(scene))
        _assert_golden_close(img_f, img_j, str(kw))


def test_fused_grad_matches_jnp():
    """The custom VJP routes gradients through the jnp body, so fused-path
    grads must be finite and agree with the pure-jnp grads up to the small
    forward-state differences between the two backends (the per-step
    residuals differ at a few silhouette pixels, which shifts aggregated
    parameter grads by O(1%)).  The contract: same direction (cosine),
    same magnitude (norm ratio), every leaf finite."""
    import jax.numpy as jnp

    scene, _ = build_scene(16, 12)
    textures = demo_textures()
    cfg_f, cfg_j = _cfgs(fused="on")
    cfg_f = dataclasses.replace(cfg_f, width=16, height=12)
    cfg_j = dataclasses.replace(cfg_j, width=16, height=12)

    def loss(s, cfg):
        return jnp.sum(render(s, textures, cfg) ** 2)

    g_f = jax.jit(jax.grad(lambda s: loss(s, cfg_f), allow_int=True))(scene)
    g_j = jax.jit(jax.grad(lambda s: loss(s, cfg_j), allow_int=True))(scene)
    for name in ("camera", "spheres", "toruses"):
        leaves_f = jax.tree_util.tree_leaves(getattr(g_f, name))
        leaves_j = jax.tree_util.tree_leaves(getattr(g_j, name))
        for a, b in zip(leaves_f, leaves_j):
            a = np.asarray(a).ravel()
            b = np.asarray(b).ravel()
            if a.dtype.kind != "f":
                continue
            assert np.isfinite(a).all(), name
            nb = float(np.linalg.norm(b))
            if nb < 1e-6:
                assert float(np.linalg.norm(a)) < 1e-4, name
                continue
            na = float(np.linalg.norm(a))
            cos = float(np.dot(a, b) / (na * nb + 1e-30))
            assert cos > 0.99, f"{name}: cosine {cos:.4f}"
            assert 0.9 < na / nb < 1.1, f"{name}: norm ratio {na/nb:.3f}"


def test_fused_compaction_path(monkeypatch):
    """Force the block-compact fetch path (per-block any + block gather +
    block scatter-back) at tiny sizes and check it matches the full-fetch
    image exactly (compaction changes row traffic, never consumed values)."""
    from txr.render import fused

    scene, _ = build_scene(32, 18)     # R = 576 = 36 blocks of 16
    textures = demo_textures()
    cfg, _ = _cfgs(fused="on")

    img_full = np.asarray(jax.jit(lambda s: render(s, textures, cfg))(scene))
    monkeypatch.setattr(fused, "_COMPACT_MIN_R", 16)
    monkeypatch.setattr(fused, "_COMPACT_BLOCK", 16)
    img_comp = np.asarray(jax.jit(lambda s: render(s, textures, cfg))(scene))
    np.testing.assert_allclose(img_comp, img_full, rtol=0, atol=1e-6)


def test_tiled_ray_order_matches(monkeypatch):
    """Tiled ray order (screen-tile-major, render.TILE_H/W) is a pure
    permutation — the image must be identical to row-major order."""
    from txr.render import render as rr

    scene, _ = build_scene(64, 16)   # 64 % TILE_W == 0, 16 % TILE_H == 0
    textures = demo_textures()
    cfg = RenderConfig(width=64, height=16, iterations=2,
                       extra_refraction_steps=1)
    img_tiled = np.asarray(jax.jit(lambda s: rr.render(s, textures, cfg))(scene))
    monkeypatch.setattr(rr, "TILE_W", 1 << 20)   # force untiled
    img_plain = np.asarray(jax.jit(lambda s: rr.render(s, textures, cfg))(scene))
    np.testing.assert_allclose(img_tiled, img_plain, rtol=0, atol=1e-6)


def test_step_compaction_matches(monkeypatch):
    """Step-level block compaction (gather alive blocks -> step -> scatter
    back) must be exact: the step body is an identity on dead rays."""
    from txr.render import fused
    from txr.render import trace as tr

    scene, _ = build_scene(64, 16)
    textures = demo_textures()
    cfg = RenderConfig(width=64, height=16, iterations=3,
                       extra_refraction_steps=2, fused="off", backend="jnp")

    img_plain = np.asarray(jax.jit(lambda s: render(s, textures, cfg))(scene))
    monkeypatch.setattr(tr, "_STEP_COMPACT_MIN_R", 64)
    monkeypatch.setattr(fused, "_COMPACT_BLOCK", 16)
    img_comp = np.asarray(jax.jit(lambda s: render(s, textures, cfg))(scene))
    np.testing.assert_allclose(img_comp, img_plain, rtol=0, atol=1e-6)
