"""Round-4 attribution: where do the ~124 ms of texture-subsystem cost in
the 1080p forward frame (157 ms vs the 33 ms no-texture floor) actually
live, and what does the backward recompute pay for?

Uses the TXR_ABL_* kill switches (txr/utils/ablate.py) to remove one fetch
class at a time at the EXACT bench config, plus microbenches of a single
raw fetch pass to separate gather bandwidth from pass overhead.
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CALL_LATENCY_S = 0.024


def timed(fn, k, iters=2):
    v = float(np.asarray(fn()))
    assert np.isfinite(v)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - CALL_LATENCY_S, 1e-9) / k


def run_child(name, env):
    """Each ablation runs in a fresh process (env is read at trace time)."""
    e = dict(os.environ)
    e.update(env)
    r = subprocess.run([sys.executable, os.path.abspath(__file__)], env=e,
                       capture_output=True, text=True, timeout=1800)
    out = (r.stdout.strip().splitlines() or ["{}"])[-1]
    try:
        return json.loads(out)
    except Exception:
        print(f"{name}: child failed\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}",
              file=sys.stderr)
        return {}


def child_main(mode):
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("TXR_COMPILE_CACHE", "/root/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from txr.apps.demo import build_scene, demo_textures
    from txr.render.trace import RenderConfig
    from txr.render.render import render
    from txr.render.texture import with_mips

    W, H = 1920, 1080
    scene, _ = build_scene(W, H)
    # atlases built OUTSIDE the frame jit: default layouts gather ~4x
    # faster than the transposed layout XLA picks for the in-jit build
    textures = jax.jit(with_mips)(demo_textures())
    n_rays = W * H
    cfg = RenderConfig(width=W, height=H, iterations=5,
                       extra_refraction_steps=6, ray_chunk=1 << 19)
    if os.environ.get("TXR_DECOMP_CFG"):
        cfg = dataclasses.replace(cfg, **json.loads(os.environ["TXR_DECOMP_CFG"]))

    if mode == "fwd":
        K = 2

        # scene/textures as ARGS (closure constants bake ~200MB of atlas
        # into the program body → tunnel HTTP 413)
        @jax.jit
        def chain(scene, textures):
            acc = jnp.float32(0.0)
            for _ in range(K):
                s = dataclasses.replace(
                    scene, camera=dataclasses.replace(
                        scene.camera, pos=scene.camera.pos + acc * 1e-30))
                acc = acc + jnp.sum(render(s, textures, cfg))
            return acc

        t = timed(lambda: chain(scene, textures), K)
        print(json.dumps({"ms": round(t * 1e3, 2),
                          "mrays": round(n_rays / t / 1e6, 2)}))
        return

    if mode == "bwd":
        K = 1
        # smaller chunks for the backward program: its residual temps are
        # chunk-width-proportional and the 512K-chunk backward sits ~1.4GB
        # over HBM with the padded pinned-table copies (r4)
        if cfg.ray_chunk == 1 << 19:
            cfg = dataclasses.replace(cfg, ray_chunk=1 << 18)
        target = jax.lax.stop_gradient(
            jax.jit(lambda s, t: render(s, t, cfg))(scene, textures))

        def loss(s, textures, target):
            return jnp.mean((render(s, textures, cfg) - target) ** 2)

        grad_fn = jax.grad(loss, allow_int=True)

        @jax.jit
        def chain(scene, textures, target):
            g = grad_fn(scene, textures, target)
            return jnp.sum(g.camera.pos) + jnp.sum(g.spheres.pos)

        t = timed(lambda: chain(scene, textures, target), K)
        print(json.dumps({"ms": round(t * 1e3, 2),
                          "mrays": round(n_rays / t / 1e6, 2)}))
        return

    if mode == "micro":
        # raw fetch passes at 512K lanes on the demo scene atlas
        from txr.render.texture import with_mips, sample_block
        from txr.render import fused

        tex = jax.jit(with_mips)(demo_textures())
        sa = tex.atlas2d
        R = 1 << 19
        key = jax.random.PRNGKey(0)
        k = jax.random.randint(key, (R,), 0, len(sa.pa.base))
        uv = jax.random.uniform(jax.random.fold_in(key, 1), (R, 2))
        lod = jax.random.uniform(jax.random.fold_in(key, 2), (R,)) * 3.0
        need = jax.random.uniform(jax.random.fold_in(key, 3), (R,)) < 0.1
        rap = tex.ring_alpha_packed

        res = {}

        def t_of(f, *args):
            g = jax.jit(lambda *a: jnp.sum(f(*a)))
            g(*args)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(g(*args))
                ts.append(time.perf_counter() - t0)
            return (min(ts) - CALL_LATENCY_S) * 1e3

        # decompose sample_block: raw gather vs decode tail
        ba = sa.pa
        row = jax.random.randint(jax.random.fold_in(key, 4), (R,), 0,
                                 ba.qatlas.shape[0])
        gu = jax.random.randint(jax.random.fold_in(key, 5), (R,), 0,
                                 ba.qatlas.shape[1])
        res["raw_gather2d_u8_512k"] = round(t_of(
            lambda r_, g_: ba.qatlas_u8[r_, g_].astype(jnp.float32), row, gu), 2)
        res["raw_gather2d_f32_512k"] = round(t_of(
            lambda r_, g_: ba.qatlas[r_, g_], row, gu), 2)
        flat = ba.qatlas_u8.reshape(-1, 16)
        fi = (row * ba.qatlas_u8.shape[1] + gu)
        res["raw_gather_flat_u8_512k"] = round(t_of(
            lambda i_: flat[i_].astype(jnp.float32), fi), 2)
        qrows = flat[fi]

        def decode_only(qi, lodv):
            # the sample_block tail from the gather result onward
            dt = jnp.float32
            ch = [((qi >> jnp.uint32(s)) & jnp.uint32(0xFF)).astype(dt) / 255.0
                  for s in (0, 8, 16, 24)]
            q = jnp.stack(ch, axis=-1)
            blk = q.reshape(q.shape[:-2] + (4, 4, 4))
            from txr.render.texture import _sel4_rows, _sel4_cols, mip_down_u8
            tv = (lodv * 0).astype(jnp.int32) + 1
            tu = tv
            fu = (lodv % 1.0)[..., None]
            fv = fu
            ra = _sel4_rows(blk, tv)
            rb = _sel4_rows(blk, tv + 1)
            c00 = _sel4_cols(ra, tu)
            c01 = _sel4_cols(ra, tu + 1)
            c10 = _sel4_cols(rb, tu)
            c11 = _sel4_cols(rb, tu + 1)
            lo = (c00 * (1 - fu) + c01 * fu) * (1 - fv) + (
                c10 * (1 - fu) + c11 * fu) * fv
            a_ = blk[..., 0::2, 0::2, :]
            b_ = blk[..., 0::2, 1::2, :]
            c_ = blk[..., 1::2, 0::2, :]
            d_ = blk[..., 1::2, 1::2, :]
            m = mip_down_u8(a_, b_, c_, d_, dt)
            hi = m[..., 0, 0, :]
            f = (lodv % 1.0)[..., None]
            return lo * (1 - f) + hi * f

        res["decode_tail_512k"] = round(t_of(decode_only, qrows, lod), 2)
        res["gather_plus_decode_512k"] = round(t_of(
            lambda i_, l_: decode_only(flat[i_], l_), fi, lod), 2)
        res["block_u8_full_512k"] = round(t_of(
            lambda k, uv, lod: sample_block(sa.pa, k, uv, lod, use_u8=True),
            k, uv, lod), 2)
        res["block_u8_full_512k_lod0"] = round(t_of(
            lambda k, uv: sample_block(sa.pa, k, uv, None, use_u8=True),
            k, uv), 2)
        res["block_f32_full_512k"] = round(t_of(
            lambda k, uv, lod: sample_block(sa.pa, k, uv, lod, use_u8=False),
            k, uv, lod), 2)
        res["block_u8_compact10pct"] = round(t_of(
            lambda k, uv, lod, need: fused._block_compact(
                lambda k_, uv_, l_: sample_block(sa.pa, k_, uv_, l_, use_u8=True),
                need, (k, uv, lod), (4,), jnp.float32, keep_frac=2),
            k, uv, lod, need), 2)
        if rap is not None:
            from txr.render.texture import sample_packed
            kz = jnp.zeros((R,), jnp.int32)
            res["ringalpha_full_512k"] = round(t_of(
                lambda uv: sample_packed(rap, kz, uv, None)[..., 0], uv), 2)
        print(json.dumps(res))
        return


def main():
    child = os.environ.get("TXR_DECOMP_CHILD")
    if child:
        child_main(child.split(":")[0])
        return

    results = {}

    def report(name, mode, env=None, cfg=None):
        e = dict(env or {})
        if cfg:
            e["TXR_DECOMP_CFG"] = json.dumps(cfg)
        e["TXR_DECOMP_CHILD"] = mode
        r = run_child(name, e)
        results[name] = r
        print(f"{name:44s} {r.get('ms', 'FAIL'):>9} ms", file=sys.stderr)

    report("micro fetch passes", "micro")
    report("fwd full", "fwd")
    report("fwd no ring-alpha", "fwd", {"TXR_ABL_RINGALPHA": "1"})
    report("fwd no hit-fetch", "fwd", {"TXR_ABL_HITFETCH": "1"})
    report("fwd no env", "fwd", {"TXR_ABL_ENV": "1"})
    report("fwd no fetches at all", "fwd",
           {"TXR_ABL_RINGALPHA": "1", "TXR_ABL_HITFETCH": "1",
            "TXR_ABL_ENV": "1"})
    report("fwd no texture_lod", "fwd", cfg={"texture_lod": False})
    report("bwd full", "bwd")
    report("bwd no ring-alpha", "bwd", {"TXR_ABL_RINGALPHA": "1"})
    report("bwd no hit-fetch", "bwd", {"TXR_ABL_HITFETCH": "1"})
    report("bwd no fetches at all", "bwd",
           {"TXR_ABL_RINGALPHA": "1", "TXR_ABL_HITFETCH": "1"})
    report("bwd no remat", "bwd", cfg={"remat": False})
    report("bwd shadows off", "bwd", cfg={"shadow_enabled": False})
    report("bwd fused off (jnp fwd too)", "bwd", cfg={"fused": "off"})
    print(json.dumps(results))


if __name__ == "__main__":
    main()
