"""The one-gather BlockAtlas trilinear must reproduce the 2-gather
quad-atlas trilinear (same pyramid, same lerp) for both wrap modes."""

import numpy as np
import jax.numpy as jnp

from txr.render.texture import (
    BLOCK_LOD_EPS,
    build_block_atlas,
    build_packed_atlas,
    sample_block,
    sample_packed,
    with_mips,
    TextureSet,
)


def _rand_tex(rng, h, w):
    return jnp.asarray(rng.random((h, w, 4), np.float32))


def test_block_matches_quad_trilinear_repeat():
    rng = np.random.default_rng(0)
    texs = [_rand_tex(rng, 32, 64), _rand_tex(rng, 16, 16), _rand_tex(rng, 64, 32)]
    ba = build_block_atlas(texs, ["repeat"] * 3)
    pa = build_packed_atlas(texs, wrap="repeat")

    R = 4096
    k = jnp.asarray(rng.integers(0, 3, R), jnp.int32)
    uv = jnp.asarray(rng.random((R, 2), np.float32) * 4.0 - 2.0)  # wraps
    lod = jnp.asarray(rng.random(R, np.float32) * 5.0)

    got = sample_block(ba, k, uv, lod)
    # the quad path with the same eps clamp (levels differ per texture)
    lmax = jnp.asarray(ba.levels, jnp.float32)[k] - 1.0 - BLOCK_LOD_EPS
    want = sample_packed(pa, k, uv, jnp.minimum(lod, jnp.maximum(lmax, 0.0)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_block_matches_quad_bilinear_clamp():
    rng = np.random.default_rng(1)
    texs = [_rand_tex(rng, 32, 32), _rand_tex(rng, 16, 64)]
    ba = build_block_atlas(texs, ["clamp"] * 2, mips=[False, False])
    pa = build_packed_atlas(texs, wrap="clamp", mips=False)

    R = 4096
    k = jnp.asarray(rng.integers(0, 2, R), jnp.int32)
    uv = jnp.asarray(rng.random((R, 2), np.float32))  # [0,1], incl. edges
    uv = uv.at[:8].set(jnp.asarray([[0, 0], [1, 1], [0, 1], [1, 0],
                                    [0.5, 0], [0, 0.5], [1, 0.5], [0.5, 1]],
                                   jnp.float32))

    got = sample_block(ba, k, uv, None)
    want = sample_packed(pa, k, uv, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_block_lod_none_is_level0():
    rng = np.random.default_rng(2)
    texs = [_rand_tex(rng, 32, 64)]
    ba = build_block_atlas(texs, ["repeat"])
    pa = build_packed_atlas(texs, wrap="repeat")
    R = 1024
    k = jnp.zeros(R, jnp.int32)
    uv = jnp.asarray(rng.random((R, 2), np.float32))
    np.testing.assert_allclose(
        np.asarray(sample_block(ba, k, uv, None)),
        np.asarray(sample_packed(pa, k, uv, None)),
        rtol=1e-5, atol=1e-5,
    )


def test_with_mips_keeps_cubemap_separate():
    """The cubemap stays OUT of the scene atlas: environment fetches are
    deferred to one post-loop pass, and the standalone 6-face atlas is a
    small table with ~4x the gather throughput (gather_bench r3)."""
    rng = np.random.default_rng(3)
    ts = TextureSet(
        sphere=(_rand_tex(rng, 16, 32),),
        cubemap=jnp.asarray(rng.random((6, 8, 8, 4), np.float32)),
    )
    out = with_mips(ts)
    sa = out.atlas2d
    assert sa is not None and sa.cube_base is None
    assert len(sa.pa.base) == 1           # only the sphere texture
    assert out.cubemap_packed is not None
    assert len(out.cubemap_packed.base) == 6


def test_block_matches_quad_trilinear_clamp():
    """The clamp-wrap trilinear branch (ADVICE r2): unused by the demo
    (clamp textures are mip-less cubemap faces) but reachable via the public
    build_block_atlas API — must agree with the quad-atlas path, including
    at uv exactly 0 and 1 and outside [0,1]."""
    rng = np.random.default_rng(5)
    texs = [_rand_tex(rng, 32, 64), _rand_tex(rng, 16, 16)]
    ba = build_block_atlas(texs, ["clamp"] * 2, mips=[True, True])
    pa = build_packed_atlas(texs, wrap="clamp")

    R = 4096
    k = jnp.asarray(rng.integers(0, 2, R), jnp.int32)
    uv = jnp.asarray(rng.random((R, 2), np.float32) * 2.0 - 0.5)  # clamps
    uv = uv.at[:8].set(jnp.asarray([[0, 0], [1, 1], [0, 1], [1, 0],
                                    [0.5, 0], [0, 0.5], [1, 0.5], [0.5, 1]],
                                   jnp.float32))
    lod = jnp.asarray(rng.random(R, np.float32) * 5.0)
    lod = lod.at[:4].set(jnp.asarray([0.0, 5.0, 4.0, 1.5], jnp.float32))

    got = sample_block(ba, k, uv, lod)
    want = sample_packed(pa, k, uv, lod)  # sample_packed now eps-clamps too
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_block_u8_matches_f32():
    """The RGBA8-packed storage reproduces the f32 atlas to the ulp — both
    store quantize_u8 values (k/255 in f32) and the u8 decode re-reads the
    SAME texel codes, so the only daylight is XLA's FMA-contraction freedom
    in the (identical-formula) lerp: ≤ 2 ulp, vs the 2e-3 oracle-gate
    tolerance that governs end-to-end correctness."""
    from txr.render.texture import sample_block

    rng = np.random.default_rng(9)
    texs = [_rand_tex(rng, 32, 64), _rand_tex(rng, 16, 16)]
    ba = build_block_atlas(texs, ["repeat"] * 2)
    assert ba.qatlas_u8 is not None

    R = 4096
    k = jnp.asarray(rng.integers(0, 2, R), jnp.int32)
    uv = jnp.asarray(rng.random((R, 2), np.float32) * 3.0 - 1.0)
    lod = jnp.asarray(rng.random(R, np.float32) * 5.0)
    for l in (None, lod):
        a = np.asarray(sample_block(ba, k, uv, l, use_u8=False))
        b = np.asarray(sample_block(ba, k, uv, l, use_u8=True))
        np.testing.assert_allclose(a, b, rtol=0, atol=2.4e-7)
