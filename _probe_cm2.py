import time, jax, jax.numpy as jnp
from txr.apps.demo import demo_textures
from txr.render import texture as tx

textures = demo_textures()
R = 1 << 18
key = jax.random.PRNGKey(0)
d = jax.random.normal(key, (R,3)); d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
rd_tile = jnp.tile(jnp.array([[0.,0.,1.]]), (R,1))

def bench(f,*a,n=5):
    jax.block_until_ready(f(*a)); t0=time.perf_counter()
    for _ in range(n): r=f(*a)
    jax.block_until_ready(r); return (time.perf_counter()-t0)/n*1e3

f1 = jax.jit(lambda tex, rd: tx.sample_cubemap(tex.cubemap, rd))
print("full TextureSet arg, random d: %.1f ms" % bench(f1, textures, d))
print("full TextureSet arg, tiled rd: %.1f ms" % bench(f1, textures, rd_tile))
f2 = jax.jit(lambda c, rd: tx.sample_cubemap(c, rd))
print("cubemap-only arg, tiled rd: %.1f ms" % bench(f2, textures.cubemap, rd_tile))
print("devices of leaves:", {k: str(v.devices() if hasattr(v,'devices') else None) for k,v in [("cubemap",textures.cubemap),("sphere0",textures.sphere[0])]})
