"""Scene / optimisation checkpointing (SURVEY §5).

The reference rebuilds its scene from code every run (main.cpp:43-132) with
no persistence.  TXR scenes are pytrees, so serialisation is: topology
(counts, dtypes, texture assignment — the static part that the reference
baked into shader defines) as JSON structure + parameters as an .npz —
enough to resume an inverse-rendering run or re-render a saved scene, with
no orbax dependency.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np
import jax
import jax.numpy as jnp


def _flatten(tree, prefix=""):
    out = {}
    if dataclasses.is_dataclass(tree):
        for f in dataclasses.fields(tree):
            out.update(_flatten(getattr(tree, f.name), f"{prefix}{f.name}."))
    elif isinstance(tree, dict):
        for k in sorted(tree):
            out.update(_flatten(tree[k], f"{prefix}{k}."))
    elif isinstance(tree, (tuple, list)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}."))
    elif tree is None:
        out[prefix[:-1] + "#none"] = None
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _atomic_savez(path, meta, arrays):
    """Write-to-temp + rename so a crash (SIGKILL, host loss) mid-write can
    never corrupt the last good checkpoint — the restart-world recovery
    contract (SURVEY §5 failure detection) depends on the previous file
    surviving any interruption of the next save."""
    # keep the .npz suffix: np.savez would silently append one otherwise
    tmp = f"{path}.{os.getpid()}.tmp.npz"
    try:
        np.savez_compressed(tmp, __meta__=json.dumps(meta), **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return path


def save_scene(path, scene, textures=None, extra=None):
    """Write scene (and optionally textures / extra arrays) to ``path``
    (.npz).  Returns path."""
    flat = {f"scene.{k}": v for k, v in _flatten(scene).items()}
    if textures is not None:
        flat.update({f"tex.{k}": v for k, v in _flatten(textures).items()})
    if extra:
        flat.update({f"extra.{k}": v for k, v in _flatten(extra).items()})
    arrays = {k: v for k, v in flat.items() if v is not None}
    meta = {"none_keys": [k for k, v in flat.items() if v is None]}
    return _atomic_savez(path, meta, arrays)


def load_arrays(path):
    """→ dict of {dotted path: np.ndarray} plus the set of None keys."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    arrays = {k: data[k] for k in data.files if k != "__meta__"}
    return arrays, set(meta.get("none_keys", []))


def rebuild_tree(arrays, template, prefix=""):
    """Type-preserving inverse of _flatten: rebuild ``template``'s pytree
    structure (dataclasses, namedtuples — e.g. optax states — tuples,
    lists, dicts) with array values from ``arrays``."""
    if dataclasses.is_dataclass(template):
        kw = {
            f.name: rebuild_tree(arrays, getattr(template, f.name),
                                 f"{prefix}{f.name}.")
            for f in dataclasses.fields(template)
        }
        return dataclasses.replace(template, **kw)
    if isinstance(template, tuple) and hasattr(template, "_fields"):  # NamedTuple
        return type(template)(
            *(rebuild_tree(arrays, v, f"{prefix}{i}.")
              for i, v in enumerate(template))
        )
    if isinstance(template, (tuple, list)):
        vals = [
            rebuild_tree(arrays, v, f"{prefix}{i}.") for i, v in enumerate(template)
        ]
        return type(template)(vals)
    if isinstance(template, dict):
        return {
            k: rebuild_tree(arrays, template[k], f"{prefix}{k}.")
            for k in sorted(template)
        }
    if template is None:
        return None
    key = prefix[:-1]
    arr = arrays[key]
    if isinstance(template, (bool, int, float, str)):  # static python scalars
        return type(template)(arr)
    return jnp.asarray(arr, dtype=jnp.asarray(template).dtype)


def save_state(path, state):
    """Checkpoint an arbitrary pytree ``state`` (e.g. {"params": ...,
    "opt_state": ..., "step": ...}) to ``path`` (.npz)."""
    flat = _flatten(state)
    arrays = {k: v for k, v in flat.items() if v is not None}
    meta = {"none_keys": [k for k, v in flat.items() if v is None]}
    return _atomic_savez(path, meta, arrays)


def restore_state(path, template):
    """Inverse of save_state: rebuild ``template``'s structure with values
    from the checkpoint."""
    arrays, _ = load_arrays(path)
    return rebuild_tree(arrays, template)


def restore_scene(path, scene_template, textures_template=None):
    """Rebuild (scene, textures) from a checkpoint using templates for the
    pytree structure (the 'topology'); array values come from the file."""
    arrays, _ = load_arrays(path)
    scene = rebuild_tree(arrays, scene_template, "scene.")
    textures = (
        rebuild_tree(arrays, textures_template, "tex.")
        if textures_template is not None
        else None
    )
    return scene, textures
