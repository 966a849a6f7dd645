"""Inverse rendering: recover scene parameters from target images.

BASELINE config 4: "recover primitive params and camera pose from target
image via pixel-gradient descent".  The reference has no analog (it is a
forward renderer only); this subsystem exists because the whole TPU design
is differentiable end-to-end.

The Scene pytree contains non-differentiable leaves (int32 texture ids,
bool hollow flags), so raw ``jax.grad`` needs ``allow_int=True``; the
helpers here wrap that and zero the resulting float0 tangents so optax
optimisers can consume the gradient pytree directly.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

try:
    import optax
except ImportError:  # pragma: no cover
    optax = None

from txr.render.render import render_jit


def image_loss(img, target, kind="l2"):
    d = img - target
    if kind == "l2":
        return jnp.mean(d * d)
    if kind == "l1":
        return jnp.mean(jnp.abs(d))
    raise ValueError(kind)


def _zero_int_leaves(grads, params):
    """float0 / int tangents → zeros_like(param) so optimisers accept them."""

    def fix(g, p):
        if g is None or (hasattr(g, "dtype") and g.dtype == jax.dtypes.float0):
            return jnp.zeros_like(p) if jnp.issubdtype(p.dtype, jnp.floating) else p * 0
        return g

    return jax.tree_util.tree_map(fix, grads, params)


def scene_grad(loss_fn: Callable, scene, *args, **kwargs):
    """(value, grads) of a loss over the Scene pytree, int-leaf safe."""
    val, grads = jax.value_and_grad(loss_fn, allow_int=True)(scene, *args, **kwargs)
    return val, _zero_int_leaves(grads, scene)


def select_params(mask_paths: Sequence[str]):
    """Build a filter: gradients are kept only on leaves whose dotted path
    starts with one of ``mask_paths`` (e.g. ["spheres.pos", "camera"])."""

    def apply(grads):
        flat = _flatten_with_paths(grads)
        out = {}
        for path, leaf in flat.items():
            keep = any(path == m or path.startswith(m + ".") for m in mask_paths)
            out[path] = leaf if keep else jax.tree_util.tree_map(jnp.zeros_like, leaf)
        return _unflatten_like(grads, out)

    return apply


def _flatten_with_paths(tree, prefix=""):
    out = {}
    if dataclasses.is_dataclass(tree):
        for f in dataclasses.fields(tree):
            out.update(
                _flatten_with_paths(getattr(tree, f.name), f"{prefix}{f.name}.")
            )
    else:
        out[prefix[:-1]] = tree
    return out


def _unflatten_like(template, flat, prefix=""):
    if dataclasses.is_dataclass(template):
        kw = {}
        for f in dataclasses.fields(template):
            kw[f.name] = _unflatten_like(
                getattr(template, f.name), flat, f"{prefix}{f.name}."
            )
        return dataclasses.replace(template, **kw)
    return flat[prefix[:-1]]


def optimize_scene(
    scene,
    textures,
    cfg,
    target,
    steps=100,
    lr=1e-2,
    param_paths=None,
    loss_kind="l2",
    optimizer=None,
    callback=None,
    checkpoint_path=None,
    checkpoint_every=0,
    resume=False,
    param_transform=None,
    metrics_path=None,
):
    """Gradient-descend scene parameters toward a target image.

    Returns (optimised scene, list of loss values).  ``param_paths`` limits
    which leaves move (default: all float leaves).

    ``param_transform``: optional {path: fn} applied to a parameter before
    it enters the scene (the stored parameter stays unconstrained).  The
    standard use is quaternion normalisation — the reference's rotate()
    uses the conjugate, not the inverse (rt.frag:305-311), so a non-unit
    quat scales the rotation; optimising through a normalise keeps descent
    on the rotation manifold.  e.g. {"camera.quat": lambda q: q /
    jnp.linalg.norm(q)}.

    Failure recovery (SURVEY §5): with ``checkpoint_path`` +
    ``checkpoint_every=k``, the params, optimiser state, step counter, and
    loss history are written every k steps; ``resume=True`` restarts from
    the file (if present) and continues to ``steps`` total — a resumed run
    is bit-identical to an uninterrupted one (the renderer and optax are
    deterministic and the .npz round-trip is exact)."""
    if optax is None:
        raise RuntimeError("optax not available")
    opt = optimizer or optax.adam(lr)

    # Partition: only float leaves (optionally restricted to param_paths)
    # become optimisation variables; ints/bools/frozen leaves stay put.
    flat = _flatten_with_paths(scene)

    def trainable(path, leaf):
        if not (hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)):
            return False
        if param_paths is None:
            return True
        return any(path == m or path.startswith(m + ".") for m in param_paths)

    params = {p: v for p, v in flat.items() if trainable(p, v)}

    def rebuild(params):
        merged = dict(flat)
        merged.update(params)
        if param_transform:
            for path, fn in param_transform.items():
                if path in merged:
                    merged[path] = fn(merged[path])
        return _unflatten_like(scene, merged)

    def loss_fn(params):
        return image_loss(render_jit(rebuild(params), textures, cfg), target, loss_kind)

    @jax.jit
    def step(params, opt_state):
        val, grads = jax.value_and_grad(loss_fn)(params)
        gnorm = optax.global_norm(grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, val, gnorm

    opt_state = opt.init(params)
    losses = []
    start = 0

    if checkpoint_path:
        import os

        from txr.utils.checkpoint import restore_state, save_state

        if resume and os.path.exists(checkpoint_path):
            template = {
                "params": params,
                "opt_state": opt_state,
                "step": np.int64(0),
                "losses": np.zeros(0, np.float64),
            }
            st = restore_state(checkpoint_path, template)
            params, opt_state = st["params"], st["opt_state"]
            start = int(st["step"])
            losses = [float(v) for v in np.asarray(st["losses"])]

    import time

    n_rays = cfg.width * cfg.height * cfg.supersample ** 2
    metrics_f = open(metrics_path, "a") if metrics_path else None
    for i in range(start, steps):
        t0 = time.perf_counter()
        params, opt_state, val, gnorm = step(params, opt_state)
        val = float(val)
        losses.append(val)
        if metrics_f is not None:
            # float(val) above already fenced the step, so wall_s is real.
            # One structured record per step (SURVEY §5 metrics/
            # observability; the reference has only the FPS print,
            # main.cpp:169-174).
            wall = time.perf_counter() - t0
            import json

            metrics_f.write(json.dumps({
                "step": i,
                "loss": val,
                "grad_norm": float(gnorm),
                "wall_s": round(wall, 5),
                "rays_per_s": round(n_rays / max(wall, 1e-9)),
            }) + "\n")
            metrics_f.flush()
        if callback:
            callback(i, rebuild(params), val)
        if (
            checkpoint_path
            and checkpoint_every
            and ((i + 1) % checkpoint_every == 0 or i + 1 == steps)
        ):
            save_state(
                checkpoint_path,
                {
                    "params": params,
                    "opt_state": opt_state,
                    "step": np.int64(i + 1),
                    "losses": np.asarray(losses, np.float64),
                },
            )
    if metrics_f is not None:
        metrics_f.close()
    return rebuild(params), losses
