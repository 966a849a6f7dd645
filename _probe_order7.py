import time, jax, jax.numpy as jnp, numpy as np, math
R = 1 << 18
x = jnp.ones(R)
def bench(f,*a,n=5):
    jax.block_until_ready(f(*a)); t0=time.perf_counter()
    for _ in range(n): r=f(*a)
    jax.block_until_ready(r); return (time.perf_counter()-t0)/n*1e3
triv = jax.jit(lambda x: x*2+1)
def chk(label):
    print("%s: %.2f ms" % (label, bench(triv, x)), flush=True)
chk("start")

from txr.geometry import quaternion as quat
from txr.scene.factories import SceneBuilder
from txr.scene import surface_factory as sf
SATURN_PITCH = quat.from_euler(jnp.array([math.radians(15.0), 0.0, 0.0]))

b = SceneBuilder(camera_pos=(0.0, 0.0, -5.0))
b.add_light_point((3, 5, 0), (1, 1, 1), 25.5, radius=0.1)
b.add_light_direct((3, -1, 1), (1, 1, 1), 1.5)
b.build(); chk("lights")

b.add_sphere((2, 0, 6), 1, b.material((0, 0, 1), specular=50, reflect=0.35))
b.add_sphere((-1, 0, 6), 1, b.material((1, 0, 0), specular=100, reflect=0.1), hollow=True)
b.add_sphere((0.5, 2, 6), 1, b.material((1, 1, 1), specular=200, reflect=0.1, refract=1.125, absorb=(1, 0, 2), diffuse=1.0), hollow=True)
b.build(); chk("spheres")

b.add_sphere((0, 0, 0), 5000, b.material((0, 0, 0)), texture=1)
b.add_sphere((0, 0, 0), 4150.0, b.material((0, 0, 0)), texture=2, quat=tuple(np.array(SATURN_PITCH)))
b.build(); chk("planets")

ring_q = quat.mul(quat.from_axis_angle(jnp.array([1.0, 0, 0]), math.radians(90.0)), SATURN_PITCH)
b.add_ring((0, 0, 0), 4150*1.1166, 4150*2.35, b.material((0, 0, 0)), texture=4, quat=tuple(np.array(ring_q)))
b.build(); chk("ring")

b.add_box((0, -1.2, 6), (10, 0.2, 5), b.material((1, 0.6, 0), specular=100, reflect=0.05))
b.build(); chk("box")

tq = quat.from_euler(jnp.array([math.radians(45.0), 0.0, 0.0]))
b.add_torus((-9, 0.5, 6), (1.0, 0.5), b.material((0.5, 0.4, 1), specular=200, reflect=0.2), quat=tuple(np.array(tq)))
b.build(); chk("torus")

rq = quat.from_euler(jnp.array([math.radians(90.0), 0.0, 0.0]))
b.add_surface(sf.elliptic_cone(1/3., 1/3., 1.0), b.material((0.9,0.1,0.3), specular=200, reflect=0.2),
              pos=(-5,4,6), quat=tuple(np.array(rq)),
              v_min=(-3.0e38,-1.0,-3.0e38), v_max=(3.0e38,4.0,3.0e38))
b.build(); chk("surface")
