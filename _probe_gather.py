import time, jax, jax.numpy as jnp
R = 1 << 18
H = W = 512
tex = jnp.ones((H, W, 4))
flat = tex.reshape(H*W, 4)
u = jnp.arange(R) % W
v = (jnp.arange(R) * 7) % H

def bench(f,*a,n=10):
    jax.block_until_ready(f(*a)); t0=time.perf_counter()
    for _ in range(n): r=f(*a)
    jax.block_until_ready(r); return (time.perf_counter()-t0)/n*1e3

g2d = jax.jit(lambda t,v,u: t[v,u])
print("2D fancy gather [R]->[R,4]: %.2f ms" % bench(g2d, tex, v, u))
gflat = jax.jit(lambda t,v,u: t[v*W+u])
print("flat row gather [R]->[R,4]: %.2f ms" % bench(gflat, flat, v, u))
gtake = jax.jit(lambda t,v,u: jnp.take(t, v*W+u, axis=0))
print("take axis0: %.2f ms" % bench(gtake, flat, v, u))
# 4-corner bilinear, flat
def bil(t, v, u):
    i00 = v*W+u; c00=t[i00]; c01=t[i00+1]; c10=t[i00+W]; c11=t[i00+W+1]
    return c00*0.25+c01*0.25+c10*0.25+c11*0.25
print("bilinear 4x flat: %.2f ms" % bench(jax.jit(bil), flat, v, u))
# one gather of [R,2,4] rows-pairs? gather pairs via reshape trick: table [H*W//2, 8]
