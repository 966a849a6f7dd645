"""Numerical-sanitizer toggles (SURVEY §5 "race detection / sanitizers").

JAX is functional, so the reference's race-condition surface (GPU fragment
isolation, rt.frag's per-invocation globals) has no analog; the TPU
equivalents of a sanitizer pass are NaN/Inf detection and value assertions:

* ``enable_nan_checks()`` — flips ``jax_debug_nans``/``jax_debug_infs``:
  every jit computation re-runs op-by-op when a NaN/Inf appears in an
  output and raises at the producing primitive.  Expensive; debugging only.
* ``checked_render()`` — a checkify-wrapped render that returns
  (error, image) with in-graph assertions that the image is finite; works
  under jit on device (including TPU, where debug_nans' per-op re-run is
  impractical over a tunneled runtime).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def enable_nan_checks(infs=True):
    jax.config.update("jax_debug_nans", True)
    if infs:
        jax.config.update("jax_debug_infs", True)


def disable_nan_checks():
    jax.config.update("jax_debug_nans", False)
    jax.config.update("jax_debug_infs", False)


def checked_render(scene, textures, cfg):
    """Render with an in-graph finiteness assertion.

    Returns (err, image); ``err.throw()`` raises host-side if any pixel was
    non-finite.  The check compiles into the program (one reduction), so it
    is cheap enough to leave on in long unattended runs."""
    from jax.experimental import checkify

    from txr.render.render import render

    def f(scene, textures):
        img = render(scene, textures, cfg)
        checkify.check(jnp.all(jnp.isfinite(img)), "non-finite pixels in render")
        return img

    return checkify.checkify(jax.jit(f))(scene, textures)
