"""Tiny-table lookups as where-chains.

XLA lowers ``table[idx]`` (a per-ray dynamic gather) to the TPU's scalar
gather path — measured at ~90M indices/s on v5e, which makes per-ray
primitive-parameter fetches (``pos[i]``, ``mat.color[i]`` with ``i`` a
[R]-sized index) one of the hottest ops in the frame even though the tables
hold fewer than a dozen rows.  For tables that small, an unrolled
select chain (P-1 ``jnp.where`` ops) is pure VPU work at full vector width —
orders of magnitude faster — and its transpose (a masked sum per row) is
likewise cheaper than gather's scatter-add.

This is the TPU counterpart of how the reference's fragment shader reads
primitive parameters: its per-type UBO arrays are indexed by a loop counter
the GLSL compiler fully unrolls against compile-time array sizes
(rt.frag:591-625), so every "lookup" is a register operand there too.
"""

from __future__ import annotations

import jax.numpy as jnp

# Above this row count a real gather wins (chain length scales linearly,
# gather is ~flat).  Reference scenes hold ≤ ~10 primitives per type
# (main.cpp:43-132), so the chain path is the common case by far.
UNROLL_LIMIT = 32


def small_take(table, idx, limit=UNROLL_LIMIT):
    """``table[idx]`` for a small leading axis, as a select chain.

    table: [P, ...rest]; idx: integer array [...] (callers clip to range,
    as they already must for gather).  Returns [..., ...rest].
    Bit-identical to ``table[idx]`` for in-range indices.
    """
    P = table.shape[0]
    if P > limit or P == 0:
        return table[idx]
    rest = table.ndim - 1
    if P == 1:
        return jnp.broadcast_to(table[0], idx.shape + table.shape[1:])
    sel_shape = idx.shape + (1,) * rest
    out = jnp.broadcast_to(table[0], idx.shape + table.shape[1:])
    for i in range(1, P):
        sel = (idx == i).reshape(sel_shape)
        out = jnp.where(sel, table[i], out)
    return out
