import time, jax, jax.numpy as jnp
from txr.apps.demo import demo_textures
from txr.render import texture as tx

textures = demo_textures()
cm = textures.cubemap
print("cubemap shape/dtype:", cm.shape, cm.dtype)
print("sphere tex shapes:", [t.shape for t in textures.sphere])
R = 1 << 18
key = jax.random.PRNGKey(0)
d = jax.random.normal(key, (R,3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

def bench(f,*a,n=5):
    jax.block_until_ready(f(*a)); t0=time.perf_counter()
    for _ in range(n): r=f(*a)
    jax.block_until_ready(r); return (time.perf_counter()-t0)/n*1e3

print("sample_cubemap: %.1f ms" % bench(jax.jit(lambda c,d: tx.sample_cubemap(c,d)), cm, d))

# single-face bilinear on real data, random uv
uv = jax.random.uniform(key, (R,2))
print("sample_bilinear 1 face: %.1f ms" % bench(jax.jit(lambda t,uv: tx.sample_bilinear(t, uv, wrap='clamp')), cm[0], uv))

# raw gather from one face with random indices
H,W = cm.shape[1], cm.shape[2]
v = jax.random.randint(key,(R,),0,H); u = jax.random.randint(key,(R,),0,W)
print("raw 2D gather: %.2f ms" % bench(jax.jit(lambda t,v,u: t[v,u]), cm[0], v, u))
flat = cm[0].reshape(H*W,4)
print("raw flat gather: %.2f ms" % bench(jax.jit(lambda t,i: t[i]), flat, v*W+u))
# gather from [6,H,W,4] with face index (what where-chain avoids)
face = jax.random.randint(key,(R,),0,6)
flat6 = cm.reshape(6*H*W, 4)
print("flat6 gather (face folded): %.2f ms" % bench(jax.jit(lambda t,i: t[i]), flat6, face*(H*W)+v*W+u))
