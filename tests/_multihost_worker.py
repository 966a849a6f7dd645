"""Worker for test_multihost.py: one of N locally-spawned processes forming
a multi-process JAX "pod" (SURVEY §4 item 4).  Each process owns 4 virtual
CPU devices; the global mesh spans all processes — the same
jax.distributed + global-mesh code path a real multi-host TPU slice uses,
with DCN replaced by localhost gRPC.

Prints exactly two lines: "CHECKSUM <float>" and "GRAD <gx> <gy> <gz>".
"""

import sys

coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

import functools

import numpy as np
import jax

from txr.dist.mesh import init_multihost, make_mesh

init_multihost(coordinator, num_procs, pid)

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from txr.scene.factories import SceneBuilder
from txr.render.texture import TextureSet, checkerboard, with_mips
from txr.render.trace import RenderConfig, trace
from txr.render.raygen import primary_rays

assert jax.process_count() == num_procs, jax.process_count()
assert len(jax.devices()) == 4 * num_procs, len(jax.devices())

b = SceneBuilder(camera_pos=(0, 0, -5))
b.ambient_color = (0.025,) * 3
b.shadow_ambient = (0.1,) * 3
b.add_light_point((3, 5, 0), (1, 1, 1), 25.5)
b.add_sphere((0.5, 0, 6), 1.0, b.material((0, 0, 1), specular=50, reflect=0.35))
b.add_sphere((-2, 0, 6), 1.0, b.material((1, 1, 1)), texture=1)
b.add_box((0, -1.2, 6), (10, 0.2, 5), b.material((1, 0.6, 0), specular=100))
scene = b.build()
tex = TextureSet(sphere=(checkerboard(32, 32),))
cfg = RenderConfig(width=40, height=24, refractive_glossy=False)

mesh = make_mesh((len(jax.devices()),), axis_names=("dp",))
spec = P("dp")

# every process computes the full ray grid identically, then contributes its
# addressable slice to the global sharded array (host-local -> global)
ro, rd = primary_rays(scene.camera, cfg.width, cfg.height, 1)
n = ro.shape[0]
pad = (-n) % mesh.size
ro = np.concatenate([np.asarray(ro), np.broadcast_to(np.asarray(ro[-1:]), (pad, 3))])
rd = np.concatenate([np.asarray(rd), np.broadcast_to(np.asarray(rd[-1:]), (pad, 3))])
sh = NamedSharding(mesh, spec)
per_proc = ro.shape[0] // num_procs
sl = slice(pid * per_proc, (pid + 1) * per_proc)
ro_g = jax.make_array_from_process_local_data(sh, ro[sl], ro.shape)
rd_g = jax.make_array_from_process_local_data(sh, rd[sl], rd.shape)

rep = NamedSharding(mesh, P())
scene_g = jax.device_put(scene, rep)
tex_g = jax.device_put(with_mips(tex), rep)


@jax.jit
@functools.partial(
    shard_map, mesh=mesh, in_specs=(P(), P(), spec, spec), out_specs=P()
)
def checksum(scene, tex, ro, rd):
    color = trace(scene, tex, cfg, ro, rd)
    return jax.lax.psum(jnp.sum(color), "dp")


cs = float(np.asarray(checksum(scene_g, tex_g, ro_g, rd_g)))
print(f"CHECKSUM {cs!r}", flush=True)


@jax.jit
@functools.partial(
    shard_map, mesh=mesh, in_specs=(P(), P(), P(), spec, spec), out_specs=P()
)
def grad_sphere_pos(scene, tex, pos, ro, rd):
    pos = jax.lax.pcast(pos, ("dp",), to="varying")

    def local_loss(pos):
        import dataclasses

        sc = dataclasses.replace(
            scene, spheres=dataclasses.replace(scene.spheres, pos=pos)
        )
        c = trace(sc, tex, cfg, ro, rd)
        return jnp.sum(c * c)

    g = jax.grad(local_loss)(pos)
    return jax.lax.psum(g, "dp")


g = np.asarray(grad_sphere_pos(scene_g, tex_g, scene_g.spheres.pos, ro_g, rd_g))
print(f"GRAD {float(g[0, 0])!r} {float(g[0, 1])!r} {float(g[0, 2])!r}", flush=True)
