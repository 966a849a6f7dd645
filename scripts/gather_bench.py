"""Measure XLA TPU gather throughput across table layouts — the texture
fetch is ~83% of the r2 frame (scripts/profile_breakdown.py), so the atlas
layout must be chosen from data, not guesses.

Methodology notes (learned the hard way): the gather result must be fully
consumed (summed) or XLA dead-code-eliminates the fetch; tables must be jit
*arguments*, not closure constants, or they get baked into the executable
(the tunnel rejects >100MB programs).
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
REPS = 4             # chained gathers per timing


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("TXR_COMPILE_CACHE", "/root/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    results = {}

    def timed(fn, *args):
        v = float(np.asarray(fn(*args)))
        assert np.isfinite(v)
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            ts.append(time.perf_counter() - t0)
        return max(min(ts) - CALL_LATENCY_S, 1e-9) / REPS

    def report(name, t):
        results[name] = round(t * 1e3, 3)
        print(f"{name:46s} {t*1e3:8.2f} ms/fetch ({R/t/1e6:8.1f} Mrows/s)",
              file=sys.stderr)

    def bench_flat(rows, width, sorted_idx=False, dtype=np.float32, name=None):
        # ONE jitted dispatch for all data-gen: eager per-op dispatch on the
        # tunneled device costs ~60s per op
        @jax.jit
        def mkdata(key):
            tab = jax.random.uniform(key, (rows, width), jnp.float32).astype(dtype)
            idx = jax.random.randint(key, (R,), 0, rows, jnp.int32)
            if sorted_idx:
                idx = jnp.sort(idx)
            return tab, idx

        tab, idx = jax.block_until_ready(mkdata(key))

        @jax.jit
        def chain(tab, idx):
            acc = jnp.float32(0.0)
            i = idx
            for _ in range(REPS):
                g = tab[i]
                acc = acc + jnp.sum(g.astype(jnp.float32)) * 1e-9
                i = (i + jnp.int32(1)) % rows   # dependency chain
            return acc

        report(name or f"flat [{rows}x{width} {np.dtype(dtype).name}]"
               + (" sorted" if sorted_idx else ""),
               timed(chain, tab, idx))

    bench_flat(1 << 19, 16)
    bench_flat(1 << 19, 16, sorted_idx=True)
    bench_flat(1 << 19, 8)
    bench_flat(1 << 19, 4)
    bench_flat(1 << 19, 1)
    bench_flat(1 << 19, 32)
    bench_flat(1 << 19, 16, dtype=np.float16)
    bench_flat(1 << 14, 16, name="flat small-table [16K x 16]")
    bench_flat(1 << 10, 16, name="flat tiny-table [1K x 16]")

    # half the request count (does cost scale with rows fetched?)
    @jax.jit
    def mk_h(key):
        return (jax.random.uniform(key, (1 << 19, 16), jnp.float32),
                jax.random.randint(key, (R // 4,), 0, 1 << 19, jnp.int32))

    tab, idx_h = jax.block_until_ready(mk_h(key))

    @jax.jit
    def chain_h(tab, idx):
        acc = jnp.float32(0.0)
        i = idx
        for _ in range(REPS):
            g = tab[i]
            acc = acc + jnp.sum(g) * 1e-9
            i = (i + jnp.int32(1)) % (1 << 19)
        return acc

    t = timed(chain_h, tab, idx_h)
    results["quarter requests [16]"] = round(t * 1e3, 3)
    print(f"{'quarter requests (R/4) [x16]':46s} {t*1e3:8.2f} ms/fetch "
          f"({R/4/t/1e6:8.1f} Mrows/s)", file=sys.stderr)

    # 2-index form (the current qatlas[row, cu] pattern) vs pre-flattened
    rows, W, C = 1536, 512, 16
    @jax.jit
    def mk3(key):
        return (jax.random.uniform(key, (rows, W, C), jnp.float32),
                jax.random.randint(key, (R,), 0, rows, jnp.int32),
                jax.random.randint(jax.random.PRNGKey(1), (R,), 0, W, jnp.int32))

    tab3, r_i, c_i = jax.block_until_ready(mk3(key))

    @jax.jit
    def chain3(tab3, r_i, c_i):
        acc = jnp.float32(0.0)
        rr = r_i
        for _ in range(REPS):
            g = tab3[rr, c_i]
            acc = acc + jnp.sum(g) * 1e-9
            rr = (rr + jnp.int32(1)) % rows
        return acc

    report("2-index qatlas [1536,512,16]", timed(chain3, tab3, r_i, c_i))

    @jax.jit
    def chain3f(tab3, r_i, c_i):
        acc = jnp.float32(0.0)
        flat = tab3.reshape(rows * W, C)
        rr = r_i
        for _ in range(REPS):
            g = flat[rr * W + c_i]
            acc = acc + jnp.sum(g) * 1e-9
            rr = (rr + jnp.int32(1)) % rows
        return acc

    report("same, pre-flattened index", timed(chain3f, tab3, r_i, c_i))

    # the real sampler on the demo atlas
    from txr.apps.demo import demo_textures
    from txr.render.texture import with_mips, sample_atlas

    tx = with_mips(demo_textures())
    sa = tx.atlas2d
    n_at = len(sa.pa.base)
    @jax.jit
    def mks(key):
        return (jax.random.randint(key, (R,), 0, n_at, jnp.int32),
                jax.random.uniform(key, (R, 2), jnp.float32),
                jax.random.uniform(key, (R,), jnp.float32) * 4)

    k, uv, lod = jax.block_until_ready(mks(key))

    def mk(use_lod):
        @jax.jit
        def f(qatlas, k, uv, lod):
            import dataclasses
            pa = dataclasses.replace(sa.pa, qatlas=qatlas)
            acc = jnp.float32(0.0)
            u = uv
            for _ in range(REPS):
                g = sample_atlas(pa, k, u, lod if use_lod else None)
                acc = acc + jnp.sum(g) * 1e-9
                u = u + acc * 1e-30
            return acc
        return f

    report("sample_atlas demo BLOCK (trilinear LOD)",
           timed(mk(True), sa.pa.qatlas, k, uv, lod))
    report("sample_atlas demo BLOCK (level-0 bilinear)",
           timed(mk(False), sa.pa.qatlas, k, uv, lod))

    # quad-packed (2-gather trilinear, 16-float rows) comparison
    from txr.render.texture import build_packed_atlas, sample_packed

    texs = list(tx.sphere) + [tx.box, tx.ring] + [tx.cubemap[f] for f in range(6)]
    pa2 = build_packed_atlas(texs, wrap="repeat")
    k2 = jax.block_until_ready(
        jax.jit(lambda key: jax.random.randint(key, (R,), 0, len(pa2.base),
                                               jnp.int32))(key))

    def mkp(use_lod):
        @jax.jit
        def f(qatlas, k, uv, lod):
            import dataclasses
            pa = dataclasses.replace(pa2, qatlas=qatlas)
            acc = jnp.float32(0.0)
            u = uv
            for _ in range(REPS):
                g = sample_packed(pa, k, u, lod if use_lod else None)
                acc = acc + jnp.sum(g) * 1e-9
                u = u + acc * 1e-30
            return acc
        return f

    report("sample_packed QUAD (trilinear 2-gather)",
           timed(mkp(True), pa2.qatlas, k2, uv, lod))
    report("sample_packed QUAD (level-0 bilinear)",
           timed(mkp(False), pa2.qatlas, k2, uv, lod))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
