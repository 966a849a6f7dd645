import time, jax, jax.numpy as jnp, dataclasses
from txr.apps.demo import build_scene, demo_textures
from txr.render.trace import RenderConfig, trace, hit_info, _reflected_color
from txr.render.intersect import nearest_hit
from txr.render.shading import calc_shade
from txr.render import texture as tx

W,H = 1920,1080
scene,_ = build_scene(W,H)
textures = demo_textures()
R = 1 << 18
ro = jnp.zeros((R,3)) + jnp.array([0.,0.,-5.])
rd = jnp.tile(jnp.array([[0.,0.,1.]]), (R,1))

def bench(f,*a,n=3):
    jax.block_until_ready(f(*a)); t0=time.perf_counter()
    for _ in range(n): r=f(*a)
    jax.block_until_ready(r); return (time.perf_counter()-t0)/n*1e3

t,ty,idx = jax.jit(lambda s,ro,rd: nearest_hit(s,ro,rd))(scene,ro,rd)
hi_fn = jax.jit(lambda s,tex,ro,rd,t,ty,idx: hit_info(s,tex,ro,rd,t,ty,idx))
print("hit_info: %.1f ms" % bench(hi_fn, scene, textures, ro, rd, t, ty, idx))
hi = hi_fn(scene, textures, ro, rd, t, ty, idx)

cs = jax.jit(lambda s,tex,ro,rd,hi: calc_shade(s,tex,ro,rd,hi["color"],hi["diffuse"],hi["specular"],hi["kd"],hi["ks"],hi["normal"],True,True,True))
print("calc_shade: %.1f ms" % bench(cs, scene, textures, ro, rd, hi))

cm = jax.jit(lambda tex, rd: tx.sample_cubemap(tex.cubemap, rd))
print("sample_cubemap: %.1f ms" % bench(cm, textures, rd))

n = hi["normal"]
st = jax.jit(lambda tex, n: tx.sample_sphere_texture(tex, jnp.zeros(R,jnp.int32)+1, n))
print("sample_sphere_texture: %.1f ms" % bench(st, textures, n))

rc = jax.jit(lambda s,tex,ro,rd: _reflected_color(s,tex,RenderConfig(),ro,rd))
print("_reflected_color: %.1f ms" % bench(rc, scene, textures, ro, rd))

# textureless scene variant
tex0 = dataclasses.replace(textures, sphere=(), ring=None, box=None, cubemap=None) if dataclasses.is_dataclass(textures) else None
if tex0 is not None:
    cfg1 = RenderConfig(width=W,height=H,iterations=1,extra_refraction_steps=0)
    tr1 = jax.jit(lambda s,t,ro,rd: trace(s,t,cfg1,ro,rd))
    print("trace 1 step NO textures: %.1f ms" % bench(tr1, scene, tex0, ro, rd))
