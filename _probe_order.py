import time, jax, jax.numpy as jnp
from txr.apps.demo import build_scene, demo_textures
from txr.render import texture as tx
from txr.render.intersect import nearest_hit

W,H = 1920,1080
textures = demo_textures()
R = 1 << 18
rd = jnp.tile(jnp.array([[0.,0.,1.]]), (R,1))
ro = jnp.zeros((R,3)) + jnp.array([0.,0.,-5.])

def bench(f,*a,n=5):
    jax.block_until_ready(f(*a)); t0=time.perf_counter()
    for _ in range(n): r=f(*a)
    jax.block_until_ready(r); return (time.perf_counter()-t0)/n*1e3

f1 = jax.jit(lambda tex, rd: tx.sample_cubemap(tex.cubemap, rd))
print("cubemap BEFORE scene stuff: %.1f ms" % bench(f1, textures, rd))
scene,_ = build_scene(W,H)
t,ty,idx = jax.jit(lambda s,ro,rd: nearest_hit(s,ro,rd))(scene,ro,rd)
jax.block_until_ready((t,ty,idx))
print("cubemap AFTER nearest_hit: %.1f ms" % bench(f1, textures, rd))
