import time, jax, jax.numpy as jnp, dataclasses
R = 1 << 18
def bench(f,*a,n=3):
    jax.block_until_ready(f(*a)); t0=time.perf_counter()
    for _ in range(n): r=f(*a)
    jax.block_until_ready(r); return (time.perf_counter()-t0)/n*1e3
from txr.apps.demo import build_scene, demo_textures
scene,_ = build_scene(1920,1080)
textures = demo_textures()
from txr.render.trace import RenderConfig, trace
ro = jnp.zeros((R,3)) + jnp.array([0.,0.,-5.])
rd = jnp.tile(jnp.array([[0.,0.,1.]]), (R,1))
for remat in (False, True):
    cfg = RenderConfig(width=1920,height=1080,iterations=5,remat=remat)
    ms = bench(jax.jit(lambda s,t,ro,rd,cfg=cfg: trace(s,t,cfg,ro,rd)), scene, textures, ro, rd)
    print(f"trace 13 steps remat={remat}: {ms:.2f} ms", flush=True)
