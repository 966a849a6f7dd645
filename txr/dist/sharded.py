"""Sharded rendering and training: shard_map over the ray grid.

Forward: the ray batch is sharded over the mesh ('dp' × 'sp'); every device
traces its tile against the replicated scene SoA — the SPMD re-design of the
per-fragment SIMT dispatch (GLWrapper.cpp:165).  No collectives are needed
until the image is assembled (XLA inserts the gather on the out-sharding).

Backward (BASELINE config 5): scene parameters are replicated while rays are
sharded, so each device's reverse pass produces *partial* parameter
gradients; one ``psum`` over the mesh finishes them.  The psum sits inside
``shard_map`` right after the local grad — XLA overlaps it with the
remaining backward work of other shards where the schedule allows.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from txr.render.raygen import primary_rays
from txr.render.trace import trace
from txr.diff.optimize import image_loss


def _pad_to(x, multiple):
    n = x.shape[0]
    pad = (-n) % multiple
    if pad:
        x = jnp.concatenate([x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])])
    return x, pad


def _mesh_axes(mesh):
    return tuple(mesh.axis_names)


def render_sharded(scene, textures, cfg, mesh):
    """Render with rays sharded across ``mesh`` → [H, W, 3] on host.

    Scene/textures replicate; the flat ray batch shards over all mesh axes.
    """
    axes = _mesh_axes(mesh)
    spec = P(axes)          # flat ray axis sharded over every mesh axis
    nd = mesh.size

    from txr.render.texture import with_mips

    textures = with_mips(textures)  # replicated, built once per frame

    ro, rd = primary_rays(scene.camera, cfg.width, cfg.height, cfg.supersample)
    n_rays = ro.shape[0]
    ro, pad = _pad_to(ro, nd)
    rd, _ = _pad_to(rd, nd)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), spec, spec), out_specs=spec,
    )
    def tile(scene, textures, ro, rd):
        return trace(scene, textures, cfg, ro, rd)

    color = tile(scene, textures, ro, rd)
    if pad:
        color = color[:n_rays]
    ss = cfg.supersample
    if ss > 1:
        img = color.reshape(cfg.height, ss, cfg.width, ss, 3).mean(axis=(1, 3))
    else:
        img = color.reshape(cfg.height, cfg.width, 3)
    return img


@functools.partial(jax.jit, static_argnums=(2,), static_argnames=("mesh",))
def render_sharded_jit(scene, textures, cfg, mesh):
    return render_sharded(scene, textures, cfg, mesh)


def make_train_step(textures, cfg, mesh, optimizer, param_paths=None):
    """Build a jitted sharded train step: target image → loss, psum'd scene
    grads, optax update.  Returns (init_fn, step_fn).

    The returned step is the full BASELINE config-5 computation: forward
    render of the sharded ray batch, local backward, cross-mesh psum of the
    parameter gradients, optimiser update on replicated params.
    """
    from txr.diff.optimize import _flatten_with_paths, _unflatten_like

    axes = _mesh_axes(mesh)
    spec = P(axes)
    nd = mesh.size

    def split(scene):
        flat = _flatten_with_paths(scene)

        def trainable(path, leaf):
            if not (hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)):
                return False
            if param_paths is None:
                return True
            return any(path == m or path.startswith(m + ".") for m in param_paths)

        params = {p: v for p, v in flat.items() if trainable(p, v)}
        frozen = {p: v for p, v in flat.items() if p not in params}
        return params, frozen

    def rebuild(scene, params, frozen):
        merged = dict(frozen)
        merged.update(params)
        return _unflatten_like(scene, merged)

    def init(scene):
        params, _ = split(scene)
        return optimizer.init(params)

    @jax.jit
    def step(scene, opt_state, target):
        import optax

        from txr.render.texture import with_mips

        tex = with_mips(textures)

        params, frozen = split(scene)
        ro, rd = primary_rays(scene.camera, cfg.width, cfg.height, cfg.supersample)
        target_flat = target.reshape(-1, 3)
        n = ro.shape[0]
        ro, _ = _pad_to(ro, nd)
        rd, _ = _pad_to(rd, nd)
        target_flat, _ = _pad_to(target_flat, nd)
        valid = (jnp.arange(ro.shape[0]) < n).astype(ro.dtype)

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(), P(), spec, spec, spec, spec), out_specs=(P(), P()),
        )
        def grad_tile(params, frozen, ro, rd, tgt, valid):
            # pcast-to-varying the replicated params HERE, at the shard
            # boundary, so
            # the broadcast-transpose psum of the partial parameter grads is
            # anchored at this point in the backward sweep.  Without it the
            # VMA machinery would place that psum wherever the replicated
            # closure is first consumed — which, with the dead-batch
            # lax.cond gate in trace(), can be *inside* a branch whose
            # device-varying predicate lets some devices skip the
            # collective: a cross-device deadlock.
            params = jax.tree_util.tree_map(
                lambda x: jax.lax.pcast(x, axes, to="varying"), params
            )

            def local_loss(params):
                sc = rebuild(scene, params, frozen)
                c = trace(sc, tex, cfg, ro, rd)
                return jnp.sum(valid[:, None] * (c - tgt) ** 2)

            l, g = jax.value_and_grad(local_loss)(params)
            # post-pcast, g holds this device's PARTIAL parameter grads
            # (typed varying); one explicit psum — here, outside any cond —
            # completes them.  Same for the local loss.
            l = jax.lax.psum(l, axes)
            g = jax.lax.psum(g, axes)
            return l, g

        loss_sum, grads = grad_tile(params, frozen, ro, rd, target_flat, valid)
        loss = loss_sum / (3.0 * n)
        grads = jax.tree_util.tree_map(lambda x: x / (3.0 * n), grads)

        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return rebuild(scene, params, frozen), opt_state, loss

    return init, step
