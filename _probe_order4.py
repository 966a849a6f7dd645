import time, jax, jax.numpy as jnp, numpy as np
R = 1 << 18
x = jnp.ones(R)
def bench(f,*a,n=5):
    jax.block_until_ready(f(*a)); t0=time.perf_counter()
    for _ in range(n): r=f(*a)
    jax.block_until_ready(r); return (time.perf_counter()-t0)/n*1e3
triv = jax.jit(lambda x: x*2+1)
print("trivial: %.2f ms" % bench(triv, x))

from txr.geometry import intersect as gi
ro = jnp.zeros((R,3)); rd = jnp.tile(jnp.array([[0.,0.,1.]]), (R,1))
pos = jnp.zeros((6,3)); rad = jnp.ones(6); hol = jnp.zeros(6, bool)
jax.block_until_ready(jax.jit(gi.sphere_t)(ro,rd,pos,rad,hol))
print("trivial after raw sphere_t: %.2f ms" % bench(triv, x))

from txr.apps.demo import build_scene
scene,_ = build_scene(1920,1080)
print("trivial after build_scene: %.2f ms" % bench(triv, x))
ident = jax.jit(lambda s: jax.tree_util.tree_map(lambda a: a, s))
jax.block_until_ready(ident(scene))
print("trivial after jit(identity)(scene): %.2f ms" % bench(triv, x))
sp = jax.jit(lambda ro,rd,s: gi.sphere_t(ro, rd, s.spheres.pos, s.spheres.radius, s.spheres.hollow))
jax.block_until_ready(sp(ro,rd,scene))
print("trivial after sphere_t(scene): %.2f ms" % bench(triv, x))
