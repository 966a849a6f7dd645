import time, jax, jax.numpy as jnp
from txr.apps.demo import build_scene, demo_textures
from txr.render.trace import RenderConfig, trace
from txr.render.intersect import nearest_hit, shadow_factor, all_t
from txr.render import raygen
import dataclasses

W, H = 1920, 1080
scene, _ = build_scene(W, H)
textures = demo_textures()
R = 1 << 18
ro = jnp.zeros((R,3)) + jnp.array([0.,0.,-5.])
rd = jnp.tile(jnp.array([[0.,0.,1.]]), (R,1))

def bench(f, *a, n=3):
    jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n): r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/n*1e3

nh = jax.jit(lambda s, ro, rd: nearest_hit(s, ro, rd))
print("nearest_hit full scene (262k rays): %.1f ms" % bench(nh, scene, ro, rd))

# scene without toruses

from txr.geometry import intersect as gi
tor = jax.jit(lambda ro, rd, s: gi.torus_t(ro, rd, s.toruses.pos, s.toruses.quat, s.toruses.form))
print("torus_t alone: %.1f ms" % bench(tor, ro, rd, scene))

sf = jax.jit(lambda s, ro, rd: shadow_factor(s, ro, rd, jnp.full(R, 10.0), textures))
print("shadow_factor: %.1f ms" % bench(sf, scene, ro, rd))

cfg = RenderConfig(width=W, height=H, iterations=5, ray_chunk=0)
tr = jax.jit(lambda s, t, ro, rd: trace(s, t, cfg, ro, rd))
print("trace 13 steps (262k rays): %.1f ms" % bench(tr, scene, textures, ro, rd))
cfg1 = dataclasses.replace(cfg, extra_refraction_steps=0, iterations=1)
tr1 = jax.jit(lambda s, t, ro, rd: trace(s, t, cfg1, ro, rd))
print("trace 1 step: %.1f ms" % bench(tr1, scene, textures, ro, rd))
cfg_ng = dataclasses.replace(cfg, refractive_glossy=False)
trng = jax.jit(lambda s, t, ro, rd: trace(s, t, cfg_ng, ro, rd))
print("trace 13 steps no glossy: %.1f ms" % bench(trng, scene, textures, ro, rd))
