"""Round-4 gather-layout study, v2: chained in-jit timing (K reps of the
op on rolled index sets inside ONE jit, scalar-fenced, indices passed as
jit ARGUMENTS so nothing constant-folds) to beat the tunnel's ±5 ms
call-latency noise that polluted the first micro pass.

Questions:
 1. element dtype: are uint32 gathers slower than f32 gathers? (first pass
    said 2×) — if so, BITCAST the packed-u8 atlas to f32 for the gather.
 2. row width: 16 vs 2×8 (same total bytes).
 3. full sample_block (flat decode) u8 vs f32 vs the small aux tables.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 8
CALL_LATENCY_S = 0.024


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("TXR_COMPILE_CACHE", "/root/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from txr.apps.demo import demo_textures
    from txr.render.texture import with_mips, sample_block, sample_packed

    tex = jax.jit(with_mips)(demo_textures())
    ba = tex.atlas2d.pa
    R = 1 << 19
    key = jax.random.PRNGKey(0)
    rows = ba.qatlas_u8.shape[0]
    cols = ba.qatlas_u8.shape[1]
    ridx = jax.random.randint(key, (R,), 0, rows)
    cidx = jax.random.randint(jax.random.fold_in(key, 1), (R,), 0, cols)
    k = jax.random.randint(jax.random.fold_in(key, 2), (R,), 0, len(ba.base))
    uv = jax.random.uniform(jax.random.fold_in(key, 3), (R, 2))
    lod = jax.random.uniform(jax.random.fold_in(key, 4), (R,)) * 3.0
    face = jax.random.randint(jax.random.fold_in(key, 5), (R,), 0, 6)

    u32 = ba.qatlas_u8                                     # [rows, cols, 16]
    f32v = jax.lax.bitcast_convert_type(u32, jnp.float32)  # same bytes
    f32t = ba.qatlas                                       # [rows, cols, 64] f32
    bf16t = f32t.astype(jnp.bfloat16)

    res = {}

    def fence(x):
        if x.dtype == jnp.float32 or x.dtype == jnp.bfloat16:
            u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
        else:
            u = x.astype(jnp.uint32)
        return jnp.sum((u & jnp.uint32(0xFF)).astype(jnp.float32))

    def timed(name, op):
        """K reps on shifted indices inside one jit; per-rep ms."""

        @jax.jit
        def chain(ridx, cidx, uv):
            acc = jnp.float32(0.0)
            for i in range(K):
                r_ = jnp.roll(ridx, i)
                c_ = jnp.roll(cidx, i)
                uv_ = jnp.roll(uv, i, axis=0)
                acc = acc + fence(op(r_, c_, uv_))
            return acc

        v = float(np.asarray(chain(ridx, cidx, uv)))
        assert np.isfinite(v), name
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(chain(ridx, cidx, uv))
            ts.append(time.perf_counter() - t0)
        ms = (min(ts) - CALL_LATENCY_S) / K * 1e3
        res[name] = round(ms, 2)
        print(f"{name:40s} {ms:8.2f} ms", file=sys.stderr)

    timed("u32 w16 2d", lambda r_, c_, uv_: u32[r_, c_])
    timed("f32(bitcast) w16 2d", lambda r_, c_, uv_: f32v[r_, c_])
    timed("f32 w64 2d", lambda r_, c_, uv_: f32t[r_, c_])
    timed("bf16 w32 2d", lambda r_, c_, uv_: bf16t[r_, c_])
    timed("f32(bitcast) 2x w8 2d",
          lambda r_, c_, uv_: f32v[r_, c_, :8] + f32v[r_, c_, 8:])
    u32f = u32.reshape(-1, 16)
    f32f = f32v.reshape(-1, 16)
    timed("u32 w16 flat", lambda r_, c_, uv_: u32f[r_ * cols + c_])
    timed("f32(bitcast) w16 flat", lambda r_, c_, uv_: f32f[r_ * cols + c_])
    half = f32v.reshape(-1, 8)
    timed("f32(bitcast) w8 flat-2x",
          lambda r_, c_, uv_: half[(r_ * cols + c_) * 2]
          + half[(r_ * cols + c_) * 2 + 1])

    timed("sample_block u8(flat decode)",
          lambda r_, c_, uv_: sample_block(ba, k, uv_, lod, use_u8=True))
    timed("sample_block f32",
          lambda r_, c_, uv_: sample_block(ba, k, uv_, lod, use_u8=False))

    rap = tex.ring_alpha_packed
    if rap is not None and rap.qatlas_u8 is not None:
        kz = jnp.zeros((R,), jnp.int32)
        timed("ring alpha u8 (1 word)",
              lambda r_, c_, uv_: sample_packed(rap, kz, uv_, None, use_u8=True))
        timed("ring alpha f32 quad",
              lambda r_, c_, uv_: sample_packed(rap, kz, uv_, None))

    cp = tex.cubemap_packed
    if cp is not None:
        if cp.qatlas_u8 is not None:
            timed("cubemap u8 quad",
                  lambda r_, c_, uv_: sample_packed(cp, face, uv_, None,
                                                    use_u8=True))
        timed("cubemap f32 quad",
              lambda r_, c_, uv_: sample_packed(cp, face, uv_, None))

    print(json.dumps(res))


if __name__ == "__main__":
    main()
