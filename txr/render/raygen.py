"""Primary ray generation.

The reference generates one ray per fragment from gl_FragCoord
(rt.frag:313-317): dir = normalize(rotate(cam_quat, ((x,y) − (w,h)/2)/h, 1)),
a pinhole whose FOV is fixed by the /h normalisation.  Here the whole pixel
grid is generated at once (iota), optionally at sub-pixel offsets for
supersampled AA (the SMAA replacement).

Coordinate convention: gl_FragCoord has y up from the bottom-left with
pixel centres at half-integers.  TXR images are returned row 0 = top, so the
grid maps row r → gl y = (H−1−r)+0.5.
"""

from __future__ import annotations

import jax.numpy as jnp

from txr.geometry import quaternion as quat


def pixel_grid(width, height, ss=1, dtype=jnp.float32):
    """Sub-pixel sample coordinates in gl_FragCoord convention.

    Returns (x, y) each of shape [H*ss, W*ss]: for ss=1 these are the pixel
    centres (c+0.5, (H-1-r)+0.5); for ss>1, an ss×ss uniform sub-grid per
    pixel whose average position is the pixel centre.
    """
    xs = (jnp.arange(width * ss, dtype=dtype) + 0.5) / ss
    ys_top = (jnp.arange(height * ss, dtype=dtype) + 0.5) / ss
    ys = height - ys_top  # flip: row 0 = top ⇒ largest gl y
    x = jnp.broadcast_to(xs[None, :], (height * ss, width * ss))
    y = jnp.broadcast_to(ys[:, None], (height * ss, width * ss))
    return x, y


def ray_dirs(camera_quat, x, y, width, height):
    """Camera-space dir ((x,y)−(w,h)/2)/h with z=1, rotated to world and
    normalised (getRayDir, rt.frag:313-317)."""
    h = jnp.asarray(height, x.dtype)
    dx = (x - width / 2.0) / h
    dy = (y - height / 2.0) / h
    d = jnp.stack([dx, dy, jnp.ones_like(dx)], axis=-1)
    d = quat.rotate(camera_quat, d)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def primary_rays(camera, width, height, ss=1):
    """→ (ro [N,3] broadcastable, rd [N,3]) flattened over the sample grid."""
    x, y = pixel_grid(width, height, ss)
    rd = ray_dirs(camera.quat, x, y, width, height).reshape(-1, 3)
    ro = jnp.broadcast_to(camera.pos, rd.shape)
    return ro, rd
