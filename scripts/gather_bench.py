"""Measure XLA TPU gather throughput across table layouts — the texture
fetch is ~83% of the r2 frame (scripts/profile_breakdown.py), so the atlas
layout must be chosen from data, not guesses.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CALL_LATENCY_S = 0.024
R = 1 << 21          # rays
REPS = 8             # chained gathers per timing


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("TXR_COMPILE_CACHE", "/root/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    rng = np.random.default_rng(0)
    results = {}

    def timed(fn):
        v = float(np.asarray(fn()))
        assert np.isfinite(v)
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(fn())
            ts.append(time.perf_counter() - t0)
        return max(min(ts) - CALL_LATENCY_S, 1e-9) / REPS

    def report(name, t):
        results[name] = round(t * 1e3, 3)
        print(f"{name:44s} {t*1e3:8.2f} ms/fetch ({R/t/1e6:8.1f} Mrows/s)",
              file=sys.stderr)

    def bench_flat(rows, width, sorted_idx=False, name=None):
        tab = jnp.asarray(rng.random((rows, width), np.float32))
        idx = rng.integers(0, rows, R).astype(np.int32)
        if sorted_idx:
            idx = np.sort(idx)
        idx = jnp.asarray(idx)

        def chain():
            acc = jnp.float32(0.0)
            i = idx
            for _ in range(REPS):
                g = tab[i]
                acc = acc + g[0, 0]
                i = (i + jnp.int32(1)) % rows   # dependency chain
            return acc

        report(name or f"flat [{rows}x{width}]" + (" sorted" if sorted_idx else ""),
               timed(jax.jit(chain)))

    # row-count / width sweep
    bench_flat(1 << 19, 16)
    bench_flat(1 << 19, 16, sorted_idx=True)
    bench_flat(1 << 19, 8)
    bench_flat(1 << 19, 4)
    bench_flat(1 << 19, 32)
    bench_flat(1 << 19, 128)
    bench_flat(1 << 14, 16, name="flat small-table [16K x 16]")
    bench_flat(1 << 10, 16, name="flat tiny-table [1K x 16]")

    # 2-index form (the current qatlas[row, cu] pattern)
    rows, W, C = 1536, 512, 16
    tab3 = jnp.asarray(rng.random((rows, W, C), np.float32))
    r_i = jnp.asarray(rng.integers(0, rows, R).astype(np.int32))
    c_i = jnp.asarray(rng.integers(0, W, R).astype(np.int32))

    def chain3():
        acc = jnp.float32(0.0)
        rr, cc = r_i, c_i
        for _ in range(REPS):
            g = tab3[rr, cc]
            acc = acc + g[0, 0]
            rr = (rr + jnp.int32(1)) % rows
        return acc

    report("2-index qatlas [1536,512,16]", timed(jax.jit(chain3)))

    def chain3_flat():
        acc = jnp.float32(0.0)
        rr, cc = r_i, c_i
        flat = tab3.reshape(rows * W, C)
        for _ in range(REPS):
            g = flat[rr * W + cc]
            acc = acc + g[0, 0]
            rr = (rr + jnp.int32(1)) % rows
        return acc

    report("same, pre-flattened index", timed(jax.jit(chain3_flat)))

    # the real sampler on the demo atlas
    from txr.apps.demo import demo_textures
    from txr.render.texture import with_mips, sample_atlas

    tx = with_mips(demo_textures())
    sa = tx.atlas2d
    n_at = len(sa.pa.base)
    k = jnp.asarray(rng.integers(0, n_at, R).astype(np.int32))
    uv = jnp.asarray(rng.random((R, 2), np.float32))
    lod = jnp.asarray((rng.random(R) * 4).astype(np.float32))

    def chain_s(use_lod):
        def f():
            acc = jnp.float32(0.0)
            u = uv
            for _ in range(REPS):
                g = sample_atlas(sa.pa, k, u, lod if use_lod else None)
                acc = acc + g[0, 0]
                u = u + acc * 1e-30
            return acc
        return f

    report("sample_atlas demo (trilinear LOD)", timed(jax.jit(chain_s(True))))
    report("sample_atlas demo (level-0 bilinear)", timed(jax.jit(chain_s(False))))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
