import time, sys, dataclasses
t0=time.perf_counter()
import jax, jax.numpy as jnp
print(f"import {time.perf_counter()-t0:.1f}s dev={jax.devices()}", flush=True)
from txr.apps.demo import build_scene, demo_textures
from txr.render.render import render
from txr.render.trace import RenderConfig
scene,_ = build_scene(1920,1080)
tex = demo_textures()
n=1920*1080
for desc, cfg in [
  ("1080p it5 chunk262144", RenderConfig(width=1920,height=1080,iterations=5,ray_chunk=1<<18)),
  ("1080p it5 chunk0", RenderConfig(width=1920,height=1080,iterations=5)),
]:
    f = jax.jit(lambda s,t: render(s,t,cfg))
    t0=time.perf_counter(); r=f(scene,tex); print(f"{desc}: dispatch {time.perf_counter()-t0:.1f}s", flush=True)
    jax.block_until_ready(r); t1=time.perf_counter()
    print(f"{desc}: compile+run {t1-t0:.1f}s", flush=True)
    # steady state: use numpy readback to force real completion
    t2=time.perf_counter(); out=np.sum if False else None
    r2=f(scene,tex); jax.block_until_ready(r2); t3=time.perf_counter()
    import numpy as np
    t4=time.perf_counter(); _=np.array(r2[:4,:4]); t5=time.perf_counter()
    print(f"{desc}: steady {t3-t2:.3f}s ({n/(t3-t2):,.0f} rays/s), readback {t5-t4:.3f}s", flush=True)
