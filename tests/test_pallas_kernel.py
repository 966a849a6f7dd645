"""Pallas fused nearest-hit kernel vs the jnp reference sweep.

On CPU the kernel runs in interpreter mode (same program, no Mosaic), which
validates the kernel logic; the TPU-compiled path is exercised by bench.py.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from txr.render.texture import TextureSet, checkerboard
from txr.render.trace import RenderConfig
from txr.render.render import render_jit
from txr.render.intersect import nearest_hit
from txr.render.raygen import primary_rays


def _full_scene():
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_golden import full_scene

    return full_scene()


def test_pallas_matches_jnp_nearest_hit():
    scene, _ = _full_scene()
    ro, rd = primary_rays(scene.camera, 48, 32, 1)
    t_j, ty_j, idx_j = jax.jit(
        lambda s, a, b: nearest_hit(s, a, b, True, "jnp")
    )(scene, ro, rd)
    t_p, ty_p, idx_p = jax.jit(
        lambda s, a, b: nearest_hit(s, a, b, True, "pallas")
    )(scene, ro, rd)

    t_j, t_p = np.array(t_j), np.array(t_p)
    same_slot = np.array(ty_j) == np.array(ty_p)
    # identical math modulo fusion: the winner may differ only on exact ties
    assert same_slot.mean() > 0.999, same_slot.mean()
    finite = np.isfinite(t_j) & np.isfinite(t_p) & same_slot
    is_torus = np.array(ty_j) == 4
    np.testing.assert_allclose(t_p[finite & ~is_torus], t_j[finite & ~is_torus],
                               rtol=2e-5, atol=1e-5)
    # the 60-iteration DK fixed point is fp-ordering chaotic; after the
    # shared two-step Newton polish residual disagreement is < 1e-3 relative
    np.testing.assert_allclose(t_p[finite & is_torus], t_j[finite & is_torus],
                               rtol=1e-3)
    assert (np.isfinite(t_j) == np.isfinite(t_p)).mean() > 0.999
    np.testing.assert_array_equal(np.array(idx_j)[same_slot], np.array(idx_p)[same_slot])


def test_pallas_full_render_matches():
    # small frame + trimmed bounce budget: interpret-mode pallas costs
    # ~seconds per kernel instance on CPU, and the full 13-step loop runs
    # 6 sweeps per step (nearest + shadow kernels per light)
    cfg = RenderConfig(width=24, height=16, iterations=2, extra_refraction_steps=3)
    scene, tex = _full_scene()
    img_j = np.array(render_jit(scene, tex, cfg))
    img_p = np.array(
        render_jit(scene, tex, dataclasses.replace(cfg, backend="pallas"))
    )
    diff = np.abs(img_j - img_p).max(axis=-1)
    assert (diff > 1e-3).mean() <= 0.01, (diff > 1e-3).mean()


def test_pallas_shadow_matches_jnp():
    """Fused any-hit kernel vs the jnp shadow_factor, incl. ring alpha."""
    from txr.render.intersect import shadow_factor
    from txr.render.texture import with_mips

    scene, tex = _full_scene()
    tex = with_mips(tex)
    ro, rd = primary_rays(scene.camera, 48, 32, 1)
    # shadow query geometry: from slightly off the primary origin toward a
    # fixed light point, like calc_shade does
    light = jnp.asarray([3.0, 5.0, 0.0])
    pt = ro + rd * 2.0
    ldir = light - pt
    dist = jnp.sqrt(jnp.sum(ldir * ldir, axis=-1))
    ldir = ldir / dist[..., None]

    f_j = jax.jit(lambda s, p, d, dd, tx_: shadow_factor(s, p, d, dd, tx_, True, "jnp"))
    f_p = jax.jit(lambda s, p, d, dd, tx_: shadow_factor(s, p, d, dd, tx_, True, "pallas"))
    sh_j = np.array(f_j(scene, pt, ldir, dist, tex))
    sh_p = np.array(f_p(scene, pt, ldir, dist, tex))
    # identical math modulo fusion; grazing torus roots may flip rarely
    assert (np.abs(sh_j - sh_p) > 1e-4).mean() <= 0.005, (
        np.abs(sh_j - sh_p) > 1e-4).mean()


def test_pallas_empty_types():
    """Scene with only spheres (most branches compiled out)."""
    from txr.scene.factories import SceneBuilder

    b = SceneBuilder(camera_pos=(0, 0, -5))
    b.add_light_point((3, 5, 0), (1, 1, 1), 25.5)
    b.add_sphere((0, 0, 6), 1.0, b.material((1, 0, 0)))
    scene = b.build()
    ro, rd = primary_rays(scene.camera, 16, 16, 1)
    t_j, ty_j, _ = nearest_hit(scene, ro, rd, True, "jnp")
    t_p, ty_p, _ = nearest_hit(scene, ro, rd, True, "pallas")
    np.testing.assert_array_equal(np.array(ty_j), np.array(ty_p))
    fin = np.isfinite(np.array(t_j))
    np.testing.assert_allclose(np.array(t_p)[fin], np.array(t_j)[fin], rtol=1e-5)
