import time, jax, jax.numpy as jnp
R = 1 << 18
x = jnp.ones(R)
def bench(f,*a,n=5):
    jax.block_until_ready(f(*a)); t0=time.perf_counter()
    for _ in range(n): r=f(*a)
    jax.block_until_ready(r); return (time.perf_counter()-t0)/n*1e3
triv = jax.jit(lambda x: x*2+1)
print("trivial: %.2f ms" % bench(triv, x))
from txr.apps.demo import build_scene, demo_textures
tex = demo_textures()
print("after demo_textures: %.2f ms" % bench(triv, x))
scene,_ = build_scene(1920,1080)
print("after build_scene: %.2f ms" % bench(triv, x))
