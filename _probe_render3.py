import time, jax, jax.numpy as jnp, dataclasses
from txr.apps.demo import build_scene, demo_textures
scene,_ = build_scene(1920,1080)
textures = demo_textures()
from txr.render.trace import RenderConfig
from txr.render.render import render

cfg = RenderConfig(width=1920,height=1080,iterations=5,remat=False)
f = jax.jit(lambda s,t: render(s,t,cfg))
t0=time.perf_counter()
img = jax.block_until_ready(f(scene,textures))
print("render 1080p remat=False: compile+run %.1fs" % (time.perf_counter()-t0), flush=True)
t0=time.perf_counter()
for _ in range(5): img = f(scene,textures)
jax.block_until_ready(img)
print("render 1080p remat=False: %.2f ms" % ((time.perf_counter()-t0)/5*1e3), flush=True)

cfgc = dataclasses.replace(cfg, ray_chunk=1<<18)
fc = jax.jit(lambda s,t: render(s,t,cfgc))
t0=time.perf_counter()
img = jax.block_until_ready(fc(scene,textures))
print("render chunked: compile+run %.1fs" % (time.perf_counter()-t0), flush=True)
t0=time.perf_counter()
for _ in range(5): img = fc(scene,textures)
jax.block_until_ready(img)
print("render 1080p chunk 2^18: %.2f ms" % ((time.perf_counter()-t0)/5*1e3), flush=True)
