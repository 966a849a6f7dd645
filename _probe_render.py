import time, jax, jax.numpy as jnp, dataclasses, numpy as np
def bench(f,*a,n=3):
    jax.block_until_ready(f(*a)); t0=time.perf_counter()
    for _ in range(n): r=f(*a)
    jax.block_until_ready(r); return (time.perf_counter()-t0)/n*1e3
from txr.apps.demo import build_scene, demo_textures
scene,_ = build_scene(1920,1080)
textures = demo_textures()
from txr.render.trace import RenderConfig
from txr.render.render import render
W,H = 1920,1080
for remat in (False, True):
    cfg = RenderConfig(width=W,height=H,iterations=5,remat=remat)
    f = jax.jit(lambda s,t,cfg=cfg: render(s,t,cfg))
    ms = bench(f, scene, textures)
    img = f(scene, textures)
    s = float(jnp.sum(img))  # force materialization + check non-trivial (d2h AFTER timing)
    print(f"render 1080p remat={remat}: {ms:.2f} ms  ({W*H/ms*1000/1e6:.1f} Mrays/s) sum={s:.1f}", flush=True)
