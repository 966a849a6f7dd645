"""Forward renders vs the float64 CPU oracle (BASELINE configs 1-3 shapes).

Tolerance: the JAX path runs f32, the oracle f64.  At silhouette/shadow
edges a 1-ulp difference in an intersection test can flip a pixel to a
different branch entirely, so golden comparison uses a dual criterion:
almost all pixels must agree tightly, and the handful of edge pixels must be
rare (measure-zero set sampled at finite resolution).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from txr.scene.factories import SceneBuilder
from txr.scene import surface_factory as sf
from txr.geometry import quaternion as q
from txr.render.texture import TextureSet, checkerboard
from txr.render.trace import RenderConfig
from txr.render.render import render_jit
from txr.ref.cpu_reference import render_oracle


from txr.utils.image import oracle_edge_mask  # noqa: E402  (shared with bench.py)


def assert_images_close(got, want, tol=2e-3, edge_frac=0.01, edge_tol=0.5):
    """Dual criterion: at most ``edge_frac`` of pixels may exceed ``tol``
    (silhouette pixels that fell on the other side of a branch), and no
    INTERIOR pixel — one whose oracle neighbourhood is low-contrast, so no
    branch flip could explain it — may be off by more than ``edge_tol``
    absolute.  A branch-flipped edge pixel shows the neighbouring surface's
    colour; a gross outlier in a flat region means a real bug
    (VERDICT r4 item 6)."""
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    diff = np.abs(got - want).max(axis=-1)
    frac_bad = (diff > tol).mean()
    assert frac_bad <= edge_frac, (
        f"{frac_bad:.2%} of pixels differ by more than {tol} "
        f"(max diff {diff.max():.4g})"
    )
    interior = ~oracle_edge_mask(want)
    worst_int = float(diff[interior].max()) if interior.any() else 0.0
    assert worst_int <= edge_tol, (
        f"interior-pixel error {worst_int:.4g} exceeds the absolute bound "
        f"{edge_tol} — not explainable by a silhouette branch flip"
    )


def config1_scene():
    """BASELINE config 1: textured sphere + plane, one point light."""
    b = SceneBuilder(camera_pos=(0, 0, -5))
    b.ambient_color = (0.025,) * 3
    b.shadow_ambient = (0.1,) * 3
    b.add_light_point((3, 5, 0), (1, 1, 1), 25.5)
    b.add_sphere((0, 0, 6), 1.0, b.material((0, 0, 1), specular=50, reflect=0.35))
    b.add_sphere((-2.5, 0, 6), 1.0, b.material((1, 1, 1)), texture=1)
    b.add_plane((0, 1, 0), (0, -1.5, 0), b.material((0.8, 0.8, 0.8)))
    return b.build(), TextureSet(sphere=(checkerboard(64, 64),))


def test_config1_sphere_plane_light():
    scene, tex = config1_scene()
    cfg = RenderConfig(width=64, height=48, refractive_glossy=False)
    got = render_jit(scene, tex, cfg)
    want = render_oracle(scene, tex, cfg)
    assert_images_close(got, want)


def test_config2_quadric_family():
    """BASELINE config 2: the quadric family with quaternion-rotated frames."""
    b = SceneBuilder(camera_pos=(0, 1, -14))
    b.ambient_color = (0.025,) * 3
    b.shadow_ambient = (0.1,) * 3
    b.add_light_point((3, 8, -4), (1, 1, 1), 40.0)
    b.add_light_direct((1, -1, 1), (1, 1, 1), 1.0)
    qx = tuple(np.array(q.from_axis_angle(jnp.array([1.0, 0, 0]), np.pi / 2)))
    shapes = [
        (sf.ellipsoid(1.2, 0.8, 1.0), (-8, 0, 0)),
        (sf.elliptic_paraboloid(1, 1), (-5, -1, 0)),
        (sf.hyperbolic_paraboloid(1, 1), (-2, 0, 0)),
        (sf.elliptic_hyperboloid_one_sheet(0.7, 0.7, 1), (1, 0, 0)),
        (sf.elliptic_hyperboloid_two_sheets(0.7, 0.7, 1), (4, 0, 0)),
        (sf.elliptic_cone(1 / 2, 1 / 2, 1), (7, 2, 0)),
        (sf.elliptic_cylinder(0.6, 0.6), (9, 0, 0)),
        (sf.hyperbolic_cylinder(0.5, 0.5), (-8, 4, 0)),
        (sf.parabolic_cylinder(0.4), (0, 4, 0)),
    ]
    for i, (coef, pos) in enumerate(shapes):
        quat = qx if i % 2 else (0.0, 0.0, 0.0, 1.0)
        b.add_surface(
            coef, b.material((0.3 + 0.07 * i, 0.9 - 0.08 * i, 0.5), specular=100, reflect=0.1),
            pos=pos, quat=quat, v_min=(-2.0 + pos[0], -2.0 + pos[1], -2.0 + pos[2]),
            v_max=(2.0 + pos[0], 2.0 + pos[1], 2.0 + pos[2]),
        )
    scene = b.build()
    tex = TextureSet()
    cfg = RenderConfig(width=64, height=40, refractive_glossy=False)
    got = render_jit(scene, tex, cfg)
    want = render_oracle(scene, tex, cfg)
    assert_images_close(got, want)


def full_scene():
    """BASELINE config 3 shape: every primitive type + all texture kinds +
    cubemap + refractive material."""
    b = SceneBuilder(camera_pos=(0, 0, -5))
    b.ambient_color = (0.025,) * 3
    b.shadow_ambient = (0.1,) * 3
    b.add_light_point((3, 5, 0), (1, 1, 1), 25.5)
    b.add_light_direct((3, -1, 1), (1, 1, 1), 1.5)
    b.add_sphere((2, 0, 6), 1.0, b.material((0, 0, 1), specular=50, reflect=0.35))
    b.add_sphere(
        (0.5, 2, 6), 1.0,
        b.material((1, 1, 1), specular=200, reflect=0.1, refract=1.125,
                   absorb=(1, 0, 2), diffuse=1.0),
        hollow=True,
    )
    b.add_sphere((-3.5, 0, 6), 1.0, b.material((1, 1, 1)), texture=1,
                 quat=tuple(np.array(q.from_axis_angle(jnp.array([0.0, 1, 0]), 0.7))))
    b.add_box((0, -1.2, 6), (10, 0.2, 5), b.material((1, 0.6, 0), specular=100, reflect=0.05))
    bq = tuple(np.array(q.from_axis_angle(jnp.array([0.577, 0.577, 0.577]), 0.5)))
    b.add_box((4, 1, 6), (1, 1, 1), b.material((0.8, 0.7, 0), specular=50), texture=1, quat=bq)
    tq = tuple(np.array(q.from_axis_angle(jnp.array([1.0, 0, 0]), np.pi / 4)))
    b.add_torus((-2, 0.5, 4), (1.0, 0.5), b.material((0.5, 0.4, 1), specular=200, reflect=0.2), quat=tq)
    rq = tuple(np.array(q.from_axis_angle(jnp.array([1.0, 0, 0]), np.pi / 2)))
    b.add_ring((0, 3, 6), 1.5, 3.0, b.material((1, 1, 1)), texture=1, quat=rq)
    cone = sf.elliptic_cone(1 / 3, 1 / 3, 1)
    b.add_surface(cone, b.material((0.9, 0.1, 0.3), specular=200, reflect=0.2),
                  pos=(-5, 4, 6), quat=rq,
                  v_min=(-3e38, -1, -3e38), v_max=(3e38, 4, 3e38))
    b.add_plane((0, 1, 0), (0, -6, 0), b.material((0.2, 0.3, 0.2)))

    rng = np.random.default_rng(42)
    cm = jnp.asarray(rng.uniform(0.0, 0.6, (6, 8, 8, 4)), jnp.float32)
    tex = TextureSet(
        sphere=(checkerboard(32, 32),),
        ring=checkerboard(32, 32, c1=(1, 0.8, 0.6), c2=(0.3, 0.2, 0.1)),
        box=checkerboard(32, 32, c1=(0.9, 0.6, 0.3), c2=(0.4, 0.3, 0.2)),
        cubemap=cm,
    )
    return b.build(), tex


def test_config3_full_scene():
    scene, tex = full_scene()
    cfg = RenderConfig(width=64, height=48)
    got = render_jit(scene, tex, cfg)
    want = render_oracle(scene, tex, cfg)
    # torus silhouettes + refraction caustics produce a few more edge pixels
    assert_images_close(got, want, tol=5e-3, edge_frac=0.02)


def test_refraction_budget_exhaustion():
    """A ray that would refract more times than the static budget allows
    keeps its accumulated colour and drops the tail — exactly a ray still
    alive when the reference's loop ends (rt.frag:821).  The truncation is
    part of the semantics, so the truncated JAX render must STILL match the
    oracle truncated at the same budget, and the budget must actually bind
    on this scene (the hollow glass sphere refracts ≥2 times)."""
    import dataclasses

    scene, tex = full_scene()
    # iterations=1, extra=0 → max_steps=1: a glass-entering ray spends its
    # ONLY step on the non-consuming entry refraction (i--) and is
    # truncated mid-flight; extra=6 lets the same ray finish
    cfg_small = RenderConfig(width=64, height=48, iterations=1,
                             extra_refraction_steps=0)
    cfg_big = dataclasses.replace(cfg_small, extra_refraction_steps=6)

    got_small = np.asarray(render_jit(scene, tex, cfg_small), np.float64)
    got_big = np.asarray(render_jit(scene, tex, cfg_big), np.float64)
    # the budget binds: the glass sphere's refracted paths are truncated
    assert np.abs(got_small - got_big).max() > 1e-2
    assert np.isfinite(got_small).all()

    # truncation parity with the oracle at BOTH budgets
    assert_images_close(got_small, render_oracle(scene, tex, cfg_small),
                        tol=5e-3, edge_frac=0.02)
    assert_images_close(got_big, render_oracle(scene, tex, cfg_big),
                        tol=5e-3, edge_frac=0.02)


def test_supersampled_matches_oracle():
    scene, tex = config1_scene()
    cfg = RenderConfig(width=32, height=24, supersample=2, refractive_glossy=False)
    got = render_jit(scene, tex, cfg)
    want = render_oracle(scene, tex, cfg)
    assert_images_close(got, want)


def test_flags_shadow_off():
    scene, tex = config1_scene()
    cfg = RenderConfig(width=32, height=24, shadow_enabled=False, refractive_glossy=False)
    got = render_jit(scene, tex, cfg)
    want = render_oracle(scene, tex, cfg)
    assert_images_close(got, want)
