import time, jax, jax.numpy as jnp, numpy as np, math
R = 1 << 18
x = jnp.ones(R)
def bench(f,*a,n=5):
    jax.block_until_ready(f(*a)); t0=time.perf_counter()
    for _ in range(n): r=f(*a)
    jax.block_until_ready(r); return (time.perf_counter()-t0)/n*1e3
triv = jax.jit(lambda x: x*2+1)
print("trivial: %.2f ms" % bench(triv, x))

from txr.geometry import quaternion as quat
q = quat.from_euler(jnp.array([math.radians(15.0), 0.0, 0.0]))
print("after from_euler: %.2f ms" % bench(triv, x))

from txr.scene.factories import SceneBuilder
b = SceneBuilder(camera_pos=(0.0,0.0,-5.0))
b.add_light_point((3,5,0),(1,1,1),25.5,radius=0.1)
b.add_sphere((2,0,6),1,b.material((0,0,1),specular=50,reflect=0.35))
print("after adds: %.2f ms" % bench(triv, x))
sc = b.build()
print("after build(): %.2f ms" % bench(triv, x))
import dataclasses
leaves, treedef = jax.tree_util.tree_flatten(sc)
print("n leaves:", len(leaves), "dtypes:", {str(l.dtype) if hasattr(l,'dtype') else type(l) for l in leaves})
print("types:", {type(l).__name__ for l in leaves})
