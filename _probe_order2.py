import time, jax, jax.numpy as jnp
from txr.apps.demo import build_scene, demo_textures
from txr.geometry import intersect as gi

textures = demo_textures()
R = 1 << 18
rd = jnp.tile(jnp.array([[0.,0.,1.]]), (R,1))
ro = jnp.zeros((R,3)) + jnp.array([0.,0.,-5.])
x = jnp.ones(R)

def bench(f,*a,n=5):
    jax.block_until_ready(f(*a)); t0=time.perf_counter()
    for _ in range(n): r=f(*a)
    jax.block_until_ready(r); return (time.perf_counter()-t0)/n*1e3

triv = jax.jit(lambda x: x*2+1)
print("trivial before: %.2f ms" % bench(triv, x))

scene,_ = build_scene(1920,1080)
# run pieces one by one
sp = jax.jit(lambda ro,rd,s: gi.sphere_t(ro, rd, s.spheres.pos, s.spheres.radius, s.spheres.hollow))
jax.block_until_ready(sp(ro,rd,scene))
print("trivial after sphere_t: %.2f ms" % bench(triv, x))

tor = jax.jit(lambda ro,rd,s: gi.torus_t(ro, rd, s.toruses.pos, s.toruses.quat, s.toruses.form))
jax.block_until_ready(tor(ro,rd,scene))
print("trivial after torus_t: %.2f ms" % bench(triv, x))
print("torus_t itself: %.2f ms" % bench(tor, ro, rd, scene))
print("trivial again: %.2f ms" % bench(triv, x))
