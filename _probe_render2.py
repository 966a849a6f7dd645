import time, jax, jax.numpy as jnp, dataclasses
def bench(f,*a,n=3):
    t0=time.perf_counter(); jax.block_until_ready(f(*a)); comp=time.perf_counter()-t0
    t0 = time.perf_counter()
    for _ in range(n): r=f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/n*1e3, comp
from txr.apps.demo import build_scene, demo_textures
scene,_ = build_scene(1920,1080)
textures = demo_textures()
from txr.render.trace import RenderConfig, trace
from txr.render.render import render
from txr.render.raygen import primary_rays

# real rays at increasing R via trace directly
for W,H in ((480,270),(960,540),(1920,1080)):
    sc,_ = build_scene(W,H)
    ro, rd = primary_rays(sc.camera, W, H, 1)
    ro, rd = jax.block_until_ready((ro, rd))
    cfg = RenderConfig(width=W,height=H,iterations=5,remat=False)
    ms, comp = bench(jax.jit(lambda s,t,ro,rd,cfg=cfg: trace(s,t,cfg,ro,rd)), sc, textures, ro, rd)
    print(f"trace real rays {W}x{H} ({W*H} rays): {ms:.2f} ms (compile {comp:.1f}s)", flush=True)
