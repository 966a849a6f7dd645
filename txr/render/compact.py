"""Block-level compaction for sparse per-lane work.

Per-LANE compaction (jnp.nonzero + scatter over R elements) costs ~30 ms at
2M lanes on TPU — worse than the fetch it saves.  Rays are spatially
coherent (textured/glossy/shadow lanes cluster on the objects, and the
renderer issues rays in 8×64 screen tiles — render.TILE_H/W), so BLOCK
compaction keeps ~the same selectivity while the nonzero/scatter run over
only R/B block flags.  Shared by the texture-fetch paths (fused.py,
trace.hit_info, the env pass) and the step-level compactor (trace.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# below this many lanes the compact path's overhead is not worth it;
# module-level so tests can lower it to exercise compaction
COMPACT_MIN_R = 4096
# lanes per compaction block = one 8×64 screen tile (render.TILE_H/W)
COMPACT_BLOCK = 512


def block_compact(sample, need, args, out_feat, dtype, keep_frac=4, block=None):
    """Evaluate ``sample(*args)`` only for blocks of lanes where any lane
    needs it.

    need: [R] bool; args: per-lane arrays [R, ...]; out_feat: trailing
    shape of sample's per-lane output.  Blocks of COMPACT_BLOCK lanes are
    selected with a tiny nonzero over R/B flags, gathered (few WIDE rows —
    bandwidth-class, not row-count-class), sampled at KB·B lanes, and
    block-scattered back.  Falls back to full width when more than
    1/keep_frac of the blocks need the fetch.  Lanes outside ``need`` get
    placeholder ones — never consumed, so this changes row traffic, not
    values."""
    R = need.shape[0]
    B = COMPACT_BLOCK if block is None else block
    if R % B or R // B < keep_frac * 2:
        return sample(*args)
    nb = R // B
    KB = max(1, nb // keep_frac)
    needb = jnp.any(need.reshape(nb, B), axis=1)
    cnt = jnp.sum(needb)

    def compact():
        bidx = jnp.nonzero(needb, size=KB, fill_value=nb)[0]
        src = jnp.minimum(bidx, nb - 1)
        args_k = [a.reshape((nb, B) + a.shape[1:])[src] for a in args]
        flat = [a.reshape((KB * B,) + a.shape[2:]) for a in args_k]
        texk = sample(*flat).reshape((KB, B) + out_feat)
        base = jnp.ones((nb + 1, B) + out_feat, dtype)
        return base.at[bidx].set(texk)[:nb].reshape((R,) + out_feat)

    def full():
        return sample(*args)

    return jax.lax.cond(cnt <= KB, compact, full)
