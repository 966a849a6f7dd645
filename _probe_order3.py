import time, jax, jax.numpy as jnp, numpy as np
R = 1 << 18
x = jnp.ones(R)

def bench(f,*a,n=5):
    jax.block_until_ready(f(*a)); t0=time.perf_counter()
    for _ in range(n): r=f(*a)
    jax.block_until_ready(r); return (time.perf_counter()-t0)/n*1e3

triv = jax.jit(lambda x: x*2+1)
print("trivial: %.2f ms" % bench(triv, x))

# inf-producing op
infop = jax.jit(lambda x: jnp.where(x > 2.0, x, jnp.inf))
jax.block_until_ready(infop(x))
print("trivial after inf op: %.2f ms" % bench(triv, x))

# sqrt of negative → nan
nanop = jax.jit(lambda x: jnp.sqrt(x - 2.0))
jax.block_until_ready(nanop(x))
print("trivial after nan op: %.2f ms" % bench(triv, x))

# bool ops / argmin
am = jax.jit(lambda x: jnp.argmin(x.reshape(-1, 8), axis=-1))
jax.block_until_ready(am(x))
print("trivial after argmin: %.2f ms" % bench(triv, x))

# numpy-arg transfer
f_np = jax.jit(lambda x, y: x + y.sum())
jax.block_until_ready(f_np(x, np.ones(3, np.float32)))
print("trivial after np-arg call: %.2f ms" % bench(triv, x))

# many compiled programs loaded?
for k in range(20):
    jax.block_until_ready(jax.jit(lambda x, k=k: x * (k + 2.0))(x))
print("trivial after 20 programs: %.2f ms" % bench(triv, x))
