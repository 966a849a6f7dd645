"""Closed-form unit tests per intersector (SURVEY §4 item 2)."""

import numpy as np
import jax.numpy as jnp

from txr.geometry import intersect as I
from txr.geometry import quaternion as q
from txr.scene import surface_factory as sf

IDQ = jnp.array([0.0, 0.0, 0.0, 1.0])
BIG = np.float32(np.finfo(np.float32).max)


def ray(o, d):
    d = np.asarray(d, np.float32)
    d = d / np.linalg.norm(d)
    return jnp.asarray([o], jnp.float32), jnp.asarray([d], jnp.float32)


# -- sphere ----------------------------------------------------------------

def test_sphere_through_center():
    ro, rd = ray([0, 0, -5], [0, 0, 1])
    t = I.sphere_t(ro, rd, jnp.array([[0.0, 0, 0]]), jnp.array([1.0]), jnp.array([False]))
    np.testing.assert_allclose(np.array(t), [[4.0]], atol=1e-5)


def test_sphere_miss():
    ro, rd = ray([0, 3, -5], [0, 0, 1])
    t = I.sphere_t(ro, rd, jnp.array([[0.0, 0, 0]]), jnp.array([1.0]), jnp.array([False]))
    assert np.isinf(np.array(t)).all()


def test_sphere_hollow_inside_hit():
    """rt.frag:351-352: hollow takes the far root when inside."""
    ro, rd = ray([0, 0, 0], [0, 0, 1])
    t_solid = I.sphere_t(ro, rd, jnp.array([[0.0, 0, 0]]), jnp.array([1.0]), jnp.array([False]))
    t_hollow = I.sphere_t(ro, rd, jnp.array([[0.0, 0, 0]]), jnp.array([1.0]), jnp.array([True]))
    assert np.isinf(np.array(t_solid)).all()          # near root negative → miss
    np.testing.assert_allclose(np.array(t_hollow), [[1.0]], atol=1e-5)


def test_sphere_tangent_boundary():
    ro, rd = ray([0, 1.0 + 1e-4, -5], [0, 0, 1])
    t = I.sphere_t(ro, rd, jnp.array([[0.0, 0, 0]]), jnp.array([1.0]), jnp.array([False]))
    assert np.isinf(np.array(t)).all()


# -- plane -----------------------------------------------------------------

def test_plane_oneside_rejects_backface():
    """rt.frag:358: one-sided plane only hits when approached against n."""
    pos = jnp.array([[0.0, 0, 0]])
    n = jnp.array([[0.0, 1, 0]])
    ro_above, rd_down = ray([0, 2, 0], [0, -1, 0])
    ro_below, rd_up = ray([0, -2, 0], [0, 1, 0])
    t1 = I.plane_t(ro_above, rd_down, pos, n, True)
    t2 = I.plane_t(ro_below, rd_up, pos, n, True)
    np.testing.assert_allclose(np.array(t1), [[2.0]], atol=1e-5)
    assert np.isinf(np.array(t2)).all()
    t3 = I.plane_t(ro_below, rd_up, pos, n, False)  # two-sided hits
    np.testing.assert_allclose(np.array(t3), [[2.0]], atol=1e-5)


# -- box -------------------------------------------------------------------

def test_box_axis_face():
    ro, rd = ray([0, 0, -5], [0, 0, 1])
    t = I.box_t(ro, rd, jnp.array([[0.0, 0, 0]]), IDQ[None], jnp.array([[1.0, 2, 3]]))
    np.testing.assert_allclose(np.array(t), [[2.0]], atol=1e-5)
    n = I.box_normal(ro, rd, jnp.array([0.0, 0, 0]), IDQ, jnp.array([1.0, 2, 3]))
    np.testing.assert_allclose(np.array(n), [[0, 0, -1.0]], atol=1e-5)


def test_box_inside_negative_t_parity():
    """Reference parity: rays starting inside a box report t = tN < 0
    (rt.frag:417-423 has no tN>0 check)."""
    ro, rd = ray([0, 0, 0], [0, 0, 1])
    t = I.box_t(ro, rd, jnp.array([[0.0, 0, 0]]), IDQ[None], jnp.array([[1.0, 1, 1]]))
    np.testing.assert_allclose(np.array(t), [[-1.0]], atol=1e-5)


def test_box_rotated():
    qy = q.from_axis_angle(jnp.array([0.0, 1, 0]), np.pi / 4)
    ro, rd = ray([0, 0, -5], [0, 0, 1])
    t = I.box_t(ro, rd, jnp.array([[0.0, 0, 0]]), qy[None], jnp.array([[1.0, 1, 1]]))
    np.testing.assert_allclose(np.array(t), [[5 - np.sqrt(2)]], rtol=1e-5)


# -- ring ------------------------------------------------------------------

def test_ring_annulus_bounds():
    pos = jnp.array([[0.0, 0, 0]])
    r1 = jnp.array([1.0])  # squared radii
    r2 = jnp.array([4.0])
    ro_in, rd = ray([1.5, 0, -5], [0, 0, 1])
    ro_hole, _ = ray([0.5, 0, -5], [0, 0, 1])
    ro_out, _ = ray([2.5, 0, -5], [0, 0, 1])
    assert np.allclose(np.array(I.ring_t(ro_in, rd, pos, IDQ[None], r1, r2)), 5.0)
    assert np.isinf(np.array(I.ring_t(ro_hole, rd, pos, IDQ[None], r1, r2))).all()
    assert np.isinf(np.array(I.ring_t(ro_out, rd, pos, IDQ[None], r1, r2))).all()


def test_ring_uv_range():
    uv = I.ring_uv(
        jnp.array([1.5, 0, -5.0]), jnp.array([0.0, 0, 1]), jnp.array(5.0),
        jnp.array([0.0, 0, 0]), IDQ, jnp.array(1.0), jnp.array(4.0),
    )
    u, v = np.array(uv)
    np.testing.assert_allclose(u, (1.5 ** 2 - 1) / 3, atol=1e-5)  # (p−r1)/(r2−r1)
    np.testing.assert_allclose(v, 1.0, atol=1e-5)                 # cos θ at +x


# -- torus -----------------------------------------------------------------

def test_torus_outer_hit():
    ro, rd = ray([-5, 0, 0], [1, 0, 0])
    t = I.torus_t(ro, rd, jnp.array([[0.0, 0, 0]]), IDQ[None], jnp.array([[1.0, 0.25]]))
    np.testing.assert_allclose(np.array(t), [[5 - 1.25]], atol=1e-3)


def test_torus_through_hole():
    ro, rd = ray([0, 0, -5], [0, 0, 1])  # along the axis, through the hole
    t = I.torus_t(ro, rd, jnp.array([[0.0, 0, 0]]), IDQ[None], jnp.array([[1.0, 0.25]]))
    assert np.isinf(np.array(t)).all()


def test_torus_normal_direction():
    n = I.torus_normal(
        jnp.array([-5.0, 0, 0]), jnp.array([1.0, 0, 0]), jnp.array(3.75),
        jnp.array([0.0, 0, 0]), IDQ, jnp.array([1.0, 0.25]),
    )
    np.testing.assert_allclose(np.array(n), [-1.0, 0, 0], atol=1e-3)


def test_torus_rotated():
    """Rotate the torus axis from z to x (the stored quat maps world→local,
    reference convention rt.frag:465-466).  A ray down world z then hits the
    tube in-plane (it would fly through the hole of the unrotated torus)."""
    qy = q.from_axis_angle(jnp.array([0.0, 1, 0]), np.pi / 2)
    ro, rd = ray([0, 0, -5], [0, 0, 1])
    t_rot = I.torus_t(ro, rd, jnp.array([[0.0, 0, 0]]), qy[None], jnp.array([[1.0, 0.25]]))
    t_id = I.torus_t(ro, rd, jnp.array([[0.0, 0, 0]]), IDQ[None], jnp.array([[1.0, 0.25]]))
    np.testing.assert_allclose(np.array(t_rot), [[3.75]], atol=1e-3)
    assert np.isinf(np.array(t_id)).all()  # unrotated: through the hole


# -- quadric surfaces ------------------------------------------------------

def _surface_hit(coef, ro, rd, pos=(0, 0, 0), quat=IDQ, v_min=(-BIG,) * 3, v_max=(BIG,) * 3):
    ro, rd = ray(ro, rd)
    return np.array(
        I.surface_t(
            ro, rd, jnp.array([pos], jnp.float32), jnp.asarray(quat)[None],
            jnp.array([coef], jnp.float32),
            jnp.array([v_min], jnp.float32), jnp.array([v_max], jnp.float32),
        )
    )[0, 0]


def test_quadric_unit_sphere():
    t = _surface_hit(sf.ellipsoid(1, 1, 1), [0, 0, -5], [0, 0, 1])
    np.testing.assert_allclose(t, 4.0, rtol=1e-5)


def test_quadric_ellipsoid_axes():
    t = _surface_hit(sf.ellipsoid(2, 1, 1), [-5, 0, 0], [1, 0, 0])
    np.testing.assert_allclose(t, 3.0, rtol=1e-5)


def test_quadric_cylinder():
    # axis along z, radius 0.5 → perpendicular ray hits at x = −0.5
    t = _surface_hit(sf.elliptic_cylinder(0.5, 0.5), [-5, 0, 0], [1, 0, 0])
    np.testing.assert_allclose(t, 4.5, rtol=1e-5)


def test_quadric_cone():
    # cone x²/a² + y²/b² − z²/c² = 0, apex at origin, opens along z.
    # From the axis at z=1 going +x: surface at |x| = 1/3.
    t = _surface_hit(sf.elliptic_cone(1 / 3, 1 / 3, 1.0), [0, 0.0, 1.0], [1, 0, 0])
    np.testing.assert_allclose(t, 1 / 3, rtol=1e-4)
    # off-axis ray: from x=-5 at height z=1 → surface at x = −1/3
    t = _surface_hit(sf.elliptic_cone(1 / 3, 1 / 3, 1.0), [-5, 0, 1.0], [1, 0, 0])
    np.testing.assert_allclose(t, 5 - 1 / 3, rtol=1e-4)


def test_quadric_clip_box_swaps_to_far_root():
    """checkSurfaceEdges (rt.frag:500-512): when the near hit is outside the
    clip box, the far root is used."""
    coef = sf.elliptic_cylinder(1, 1)
    # clip to y<=0 half: near hit at y=+1 is outside, far at y=-1 inside?
    # use x clip: ray along x hits cylinder at x=-1 then x=+1; clip x>0 half.
    t = _surface_hit(
        coef, [-5, 0.0, 0], [1, 0, 0],
        v_min=(0.0, -BIG, -BIG), v_max=(BIG, BIG, BIG),
    )
    np.testing.assert_allclose(t, 6.0, rtol=1e-5)  # far root x=+1


def test_quadric_clip_box_rejects_fully_outside():
    coef = sf.elliptic_cylinder(1, 1)
    t = _surface_hit(
        coef, [-5, 0.0, 0], [1, 0, 0],
        v_min=(5.0, -BIG, -BIG), v_max=(BIG, BIG, BIG),
    )
    assert np.isinf(t)


def test_quadric_paraboloid():
    # z = x² + y² (a=b=1): at z=4 the radius is 2; a perpendicular ray from
    # x=−5 hits at x=−2 → t=3.  (A ray *along* the paraboloid axis is the
    # degenerate |p2|<1e-6 linear case, which is a miss by design — the
    # reference's fallback at rt.frag:541-545 cannot hit either.)
    t = _surface_hit(sf.elliptic_paraboloid(1, 1), [-5, 0, 4], [1, 0, 0])
    np.testing.assert_allclose(t, 3.0, rtol=1e-4)


def test_quadric_hyperboloids_and_parabolic_cylinder():
    # one sheet: x²+y²−z² = 1 → at z=0 radius 1
    t = _surface_hit(sf.elliptic_hyperboloid_one_sheet(1, 1, 1), [-5, 0, 0], [1, 0, 0])
    np.testing.assert_allclose(t, 4.0, rtol=1e-4)
    # two sheets: x²+y²−z² = −1 → vertex at z=±1
    t = _surface_hit(sf.elliptic_hyperboloid_two_sheets(1, 1, 1), [0, 0, -5], [0, 0, 1])
    np.testing.assert_allclose(t, 4.0, rtol=1e-4)
    # parabolic cylinder x² + 2a·y = 0, a=0.5 → y = −x²; at y=−25, x=±5.
    # (ray along −y is the degenerate p2=0 case → transverse ray instead)
    t = _surface_hit(sf.parabolic_cylinder(0.5), [-7, -25, 0], [1, 0, 0])
    np.testing.assert_allclose(t, 2.0, rtol=1e-4)


def test_quadric_degenerate_direction_is_miss():
    """|p2| < 1e-6 (ray along a ruling of the cylinder): shared-design miss
    (the reference's t>tmin comparison is a bug, see intersect.py)."""
    coef = sf.elliptic_cylinder(1, 1)
    t = _surface_hit(coef, [0.5, 0, -5], [0, 0, 1])  # parallel to axis, inside
    assert np.isinf(t)
