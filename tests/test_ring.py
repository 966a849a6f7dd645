"""Primitive-sharded ring sweep (txr/dist/ring.py) vs the replicated
nearest-hit oracle, on the 8-virtual-device CPU mesh.

Tolerances: per-device shards change XLA vectorization/fusion, and the torus
Durand–Kerner solver amplifies ulp-level input differences to ~1e-3 in the
converged root, so winner-t comparisons are allclose (not bitwise) and
type/index equality is only required where the winner is clear (the gap to
the runner-up exceeds the numeric noise)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from txr.dist.mesh import make_mesh
from txr.dist.ring import ring_nearest_hit, pad_scene_for_ring
from txr.render.intersect import nearest_hit, all_t
from txr.render.raygen import primary_rays

from tests.test_golden import full_scene

T_TOL = 2e-3
GAP = 1e-2


def _rays(scene, w=40, h=24):
    return primary_rays(scene.camera, w, h, 1)


def _clear_winners(scene, ro, rd):
    """Mask of rays whose nearest t beats the runner-up by > GAP."""
    T = np.array(jax.jit(lambda s, o, d: all_t(s, o, d))(scene, ro, rd))
    T = np.where(np.isfinite(T), T, 1e30)
    two = np.sort(T, axis=-1)[:, :2]
    return (two[:, 1] - two[:, 0]) > GAP


def test_padded_scene_never_hits_padding():
    scene, _ = full_scene()
    padded = pad_scene_for_ring(scene, 8)
    c0, c1 = scene.counts, padded.counts
    for k in c0:
        assert c1[k] % 8 == 0 and c1[k] >= c0[k]
    ro, rd = _rays(scene)
    t0, ty0, i0 = jax.jit(lambda s, o, d: nearest_hit(s, o, d))(scene, ro, rd)
    t1, ty1, i1 = jax.jit(lambda s, o, d: nearest_hit(s, o, d))(padded, ro, rd)
    # padding may only produce phantom hits beyond the cap distance
    t0, t1 = np.array(t0), np.array(t1)
    t1 = np.where(t1 >= 1e8, np.inf, t1)
    hit = np.isfinite(t0)
    np.testing.assert_array_equal(hit, np.isfinite(t1))
    np.testing.assert_allclose(t1[hit], t0[hit], rtol=1e-4, atol=1e-5)
    clear = _clear_winners(scene, ro, rd) & hit
    np.testing.assert_array_equal(np.array(ty1)[clear], np.array(ty0)[clear])
    np.testing.assert_array_equal(np.array(i1)[clear], np.array(i0)[clear])


@pytest.mark.parametrize("n_dev", [4, 8])
def test_ring_matches_replicated(n_dev):
    scene, _ = full_scene()
    mesh = make_mesh((n_dev,), axis_names=("sp",), devices=jax.devices()[:n_dev])
    ro, rd = _rays(scene)
    t0, ty0, i0 = nearest_hit(scene, ro, rd)
    t1, ty1, i1 = ring_nearest_hit(scene, ro, rd, mesh)
    t0, t1 = np.array(t0), np.array(t1)
    hit0 = np.isfinite(t0)
    np.testing.assert_array_equal(hit0, np.isfinite(t1))
    np.testing.assert_allclose(t1[hit0], t0[hit0], rtol=1e-3, atol=T_TOL)
    clear = _clear_winners(scene, ro, rd) & hit0
    assert clear.sum() > 0.5 * hit0.sum()
    np.testing.assert_array_equal(np.array(ty1)[clear], np.array(ty0)[clear])
    np.testing.assert_array_equal(np.array(i1)[clear], np.array(i0)[clear])


def test_ring_odd_ray_count():
    scene, _ = full_scene()
    mesh = make_mesh((8,), axis_names=("sp",))
    ro, rd = _rays(scene, 13, 7)  # 91 rays, not divisible by 8
    t0, ty0, i0 = nearest_hit(scene, ro, rd)
    t1, ty1, i1 = ring_nearest_hit(scene, ro, rd, mesh)
    t0, t1 = np.array(t0), np.array(t1)
    hit = np.isfinite(t0)
    np.testing.assert_array_equal(hit, np.isfinite(t1))
    np.testing.assert_allclose(t1[hit], t0[hit], rtol=1e-3, atol=T_TOL)
    clear = _clear_winners(scene, ro, rd) & hit
    np.testing.assert_array_equal(np.array(ty1)[clear], np.array(ty0)[clear])
