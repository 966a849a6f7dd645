"""Inverse rendering: BASELINE config 4 (primitive params AND camera pose)
and the checkpoint/resume guarantee (SURVEY §5 failure recovery)."""

import dataclasses
import os

import numpy as np
import jax.numpy as jnp
import optax
import pytest

from txr.apps.inverse import make_scene, QUAT_NORMALIZE
from txr.render.texture import TextureSet, checkerboard
from txr.render.trace import RenderConfig
from txr.render.render import render_jit
from txr.diff import optimize_scene

CFG = RenderConfig(width=40, height=40, iterations=2)
# a textured floor makes the camera pose well-observed (an untextured scene
# leaves camera↔object translation nearly degenerate)
TEX = TextureSet(box=checkerboard(64, 64, tiles=16))
PARAMS = [
    "spheres.pos", "spheres.radius", "spheres.mat.color",
    "camera.pos", "camera.quat",
]


def _with_floor_texture(s):
    return dataclasses.replace(
        s, boxes=dataclasses.replace(s.boxes, texture=jnp.ones_like(s.boxes.texture))
    )


def _target_and_guess():
    target_scene = _with_floor_texture(
        make_scene((0.3, 0.2, 6.0), 1.0, (0.1, 0.2, 0.9), (0, 0, -5))
    )
    target = render_jit(target_scene, TEX, CFG)
    guess = _with_floor_texture(
        make_scene(
            (-0.2, -0.15, 6.3), 0.85, (0.4, 0.4, 0.6),
            (0.2, 0.1, -5.1), cam_quat=(0.0, 0.015, 0.0, 1.0),
        )
    )
    return target_scene, target, guess


def test_camera_and_primitive_recovery():
    """Joint recovery of sphere params + camera pose (BASELINE config 4):
    loss must collapse and the camera must move toward the true pose."""
    target_scene, target, guess = _target_and_guess()
    cam_err0 = float(jnp.sum((guess.camera.pos - target_scene.camera.pos) ** 2))

    recovered, losses = optimize_scene(
        guess, TEX, CFG, target, steps=150, param_paths=PARAMS,
        optimizer=optax.adam(optax.exponential_decay(1e-2, 40, 0.4)),
        param_transform=QUAT_NORMALIZE,
    )
    assert losses[-1] < 0.1 * losses[0], (losses[0], losses[-1])
    cam_err = float(jnp.sum((recovered.camera.pos - target_scene.camera.pos) ** 2))
    assert cam_err < 0.5 * cam_err0, (cam_err0, cam_err)
    # quat stays unit (optimised through the normalise pullback)
    assert abs(float(jnp.sum(recovered.camera.quat ** 2)) - 1.0) < 1e-3


def test_texture_recovery():
    """Texture-CONTENT recovery through the DEFAULT (fast_texels=True)
    path: perturb a patch of the floor texture, optimise ONLY the texture
    leaf against the clean render, and require the loss to collapse and
    the patch to move back toward the truth.  Regression for ADVICE r4
    (high): the u8 fetch used to zero content gradients silently, which
    froze exactly this optimisation."""
    import jax
    import optax

    target_scene = _with_floor_texture(
        make_scene((0.3, 0.2, 6.0), 1.0, (0.1, 0.2, 0.9), (0, 0, -5))
    )
    target = render_jit(target_scene, TEX, CFG)

    true_box = TEX.box
    # a uniform, non-clipping shift: mip-level sampling spreads each
    # observed gradient over a 2^l×2^l block of level-0 texels, so only a
    # perturbation that is constant within blocks is identifiable from
    # coarse-LOD observations (clipped white texels would alias)
    bad_box = true_box.at[8:24, 8:24, :3].add(-0.18)

    opt = optax.adam(0.05)

    def loss_fn(box):
        t = dataclasses.replace(TEX, box=box)
        return jnp.mean((render_jit(target_scene, t, CFG) - target) ** 2)

    @jax.jit
    def step(box, opt_state):
        loss, g = jax.value_and_grad(loss_fn)(box)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(box, upd), opt_state, loss

    # only texels the 40×40 render actually observes can be recovered;
    # everything else keeps its (wrong) value and stays out of the check
    g0 = jax.jit(jax.grad(loss_fn))(bad_box)
    seen = np.asarray(jnp.abs(g0[..., :3]).sum(-1) > 1e-12)
    assert seen[8:24, 8:24].sum() >= 8, "perturbed patch barely visible"

    box = bad_box
    opt_state = opt.init(box)
    losses = []
    for _ in range(40):
        box, opt_state, l = step(box, opt_state)
        losses.append(float(l))
    assert losses[-1] < 0.15 * losses[0], (losses[0], losses[-1])
    # observed texels in the perturbed patch moved back toward the truth
    m = seen[8:24, 8:24]
    err0 = float(np.abs(np.asarray(bad_box - true_box))[8:24, 8:24][m].mean())
    err1 = float(np.abs(np.asarray(jnp.clip(box, 0, 1) - true_box))[8:24, 8:24][m].mean())
    assert err1 < 0.6 * err0, (err0, err1)


def test_checkpoint_resume_bit_identical(tmp_path):
    """A killed-and-resumed run must equal an uninterrupted one."""
    _, target, guess = _target_and_guess()
    ckpt = str(tmp_path / "inv.npz")

    # uninterrupted 8-step run
    ref_scene, ref_losses = optimize_scene(
        guess, TEX, CFG, target, steps=8, lr=2e-2, param_paths=PARAMS
    )

    # 4 steps with checkpointing, then "crash" and resume to 8
    optimize_scene(
        guess, TEX, CFG, target, steps=4, lr=2e-2, param_paths=PARAMS,
        checkpoint_path=ckpt, checkpoint_every=2,
    )
    assert os.path.exists(ckpt)
    res_scene, res_losses = optimize_scene(
        guess, TEX, CFG, target, steps=8, lr=2e-2, param_paths=PARAMS,
        checkpoint_path=ckpt, checkpoint_every=2, resume=True,
    )

    assert len(res_losses) == len(ref_losses) == 8
    np.testing.assert_allclose(res_losses, ref_losses, rtol=1e-6)
    np.testing.assert_allclose(
        np.array(res_scene.spheres.pos), np.array(ref_scene.spheres.pos),
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.array(res_scene.camera.pos), np.array(ref_scene.camera.pos),
        rtol=1e-6, atol=1e-7,
    )
