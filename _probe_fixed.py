import time, jax, jax.numpy as jnp
R = 1 << 18
x = jnp.ones(R)
def bench(f,*a,n=5):
    jax.block_until_ready(f(*a)); t0=time.perf_counter()
    for _ in range(n): r=f(*a)
    jax.block_until_ready(r); return (time.perf_counter()-t0)/n*1e3
triv = jax.jit(lambda x: x*2+1)
print("trivial: %.2f ms" % bench(triv, x), flush=True)
from txr.apps.demo import build_scene, demo_textures
scene,_ = build_scene(1920,1080)
textures = demo_textures()
print("trivial after build_scene (must stay fast): %.2f ms" % bench(triv, x), flush=True)

from txr.render.trace import RenderConfig, trace
from txr.render.intersect import nearest_hit, shadow_factor
ro = jnp.zeros((R,3)) + jnp.array([0.,0.,-5.])
rd = jnp.tile(jnp.array([[0.,0.,1.]]), (R,1))
nh = jax.jit(lambda s, ro, rd: nearest_hit(s, ro, rd))
print("nearest_hit: %.2f ms" % bench(nh, scene, ro, rd), flush=True)
sf_ = jax.jit(lambda s, ro, rd: shadow_factor(s, ro, rd, jnp.full(R, 10.0), textures))
print("shadow_factor: %.2f ms" % bench(sf_, scene, ro, rd), flush=True)
cfg = RenderConfig(width=1920, height=1080, iterations=5)
tr = jax.jit(lambda s, t, ro, rd: trace(s, t, cfg, ro, rd))
print("trace 13 steps (262k rays): %.2f ms" % bench(tr, scene, textures, ro, rd), flush=True)
