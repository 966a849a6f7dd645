import time, jax, jax.numpy as jnp, numpy as np, dataclasses
from txr.apps.demo import build_scene, demo_textures
scene,_ = build_scene(1920,1080)
textures = demo_textures()
from txr.render.trace import RenderConfig
from txr.render.render import render
cfg = RenderConfig(width=1920,height=1080,iterations=5,remat=False)
f = jax.jit(lambda s,t: render(s,t,cfg))
img = jax.block_until_ready(f(scene,textures))
print("warm", flush=True)
# block_until_ready timing
t0=time.perf_counter()
for _ in range(3): img = f(scene,textures)
jax.block_until_ready(img)
print("block_until_ready: %.2f ms" % ((time.perf_counter()-t0)/3*1e3), flush=True)
# d2h-forced timing (this also flips slow mode, but first iteration is honest)
t0=time.perf_counter()
img = f(scene,textures)
v = np.array(img[0,0])
print("with d2h readback (1st): %.2f ms  v=%s" % ((time.perf_counter()-t0)*1e3, v), flush=True)
for _ in range(3):
    t0=time.perf_counter()
    img = f(scene,textures)
    v = np.array(img[0,0])
    print("with d2h readback: %.2f ms" % ((time.perf_counter()-t0)*1e3), flush=True)
