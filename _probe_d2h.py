import time, jax, jax.numpy as jnp, numpy as np
R = 1 << 18
x = jnp.ones(R)
def bench(f,*a,n=5):
    jax.block_until_ready(f(*a)); t0=time.perf_counter()
    for _ in range(n): r=f(*a)
    jax.block_until_ready(r); return (time.perf_counter()-t0)/n*1e3
triv = jax.jit(lambda x: x*2+1)
print("before: %.2f ms" % bench(triv, x), flush=True)
q = jnp.array([1.0, 2.0, 3.0, 4.0])
_ = np.array(q)
print("after np.array(jnp): %.2f ms" % bench(triv, x), flush=True)
# big sphere radius? texture int?
_ = float(jnp.sum(x))
print("after float(): %.2f ms" % bench(triv, x), flush=True)
