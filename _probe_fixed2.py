import time, jax, jax.numpy as jnp, dataclasses
R = 1 << 18
def bench(f,*a,n=5):
    jax.block_until_ready(f(*a)); t0=time.perf_counter()
    for _ in range(n): r=f(*a)
    jax.block_until_ready(r); return (time.perf_counter()-t0)/n*1e3
from txr.apps.demo import build_scene, demo_textures
scene,_ = build_scene(1920,1080)
textures = demo_textures()
from txr.render.trace import RenderConfig, trace, hit_info, _reflected_color
from txr.render.intersect import nearest_hit, shadow_factor
from txr.render.shading import calc_shade
from txr.render import texture as tx
from txr.geometry import intersect as gi
ro = jnp.zeros((R,3)) + jnp.array([0.,0.,-5.])
rd = jnp.tile(jnp.array([[0.,0.,1.]]), (R,1))

print("torus_t: %.2f ms" % bench(jax.jit(lambda ro,rd,s: gi.torus_t(ro,rd,s.toruses.pos,s.toruses.quat,s.toruses.form)), ro, rd, scene), flush=True)
t,ty,idx = jax.jit(lambda s,ro,rd: nearest_hit(s,ro,rd))(scene,ro,rd)
hi_fn = jax.jit(lambda s,tex,ro,rd,t,ty,idx: hit_info(s,tex,ro,rd,t,ty,idx))
print("hit_info: %.2f ms" % bench(hi_fn, scene, textures, ro, rd, t, ty, idx), flush=True)
hi = hi_fn(scene, textures, ro, rd, t, ty, idx)
cs = jax.jit(lambda s,tex,ro,rd,hi: calc_shade(s,tex,ro,rd,hi["color"],hi["diffuse"],hi["specular"],hi["kd"],hi["ks"],hi["normal"],True,True,True))
print("calc_shade: %.2f ms" % bench(cs, scene, textures, ro, rd, hi), flush=True)
print("cubemap: %.2f ms" % bench(jax.jit(lambda tex,rd: tx.sample_cubemap(tex.cubemap, rd)), textures, rd), flush=True)
rc = jax.jit(lambda s,tex,ro,rd: _reflected_color(s,tex,RenderConfig(),ro,rd))
print("_reflected_color: %.2f ms" % bench(rc, scene, textures, ro, rd), flush=True)
print("shadow_factor no tex: %.2f ms" % bench(jax.jit(lambda s,ro,rd: shadow_factor(s,ro,rd,jnp.full(R,10.0),None)), scene, ro, rd), flush=True)
print("shadow_factor with tex: %.2f ms" % bench(jax.jit(lambda s,tex,ro,rd: shadow_factor(s,ro,rd,jnp.full(R,10.0),tex)), scene, textures, ro, rd), flush=True)
cfg1 = RenderConfig(width=1920,height=1080,iterations=1,extra_refraction_steps=0)
print("trace 1 step: %.2f ms" % bench(jax.jit(lambda s,t,ro,rd: trace(s,t,cfg1,ro,rd)), scene, textures, ro, rd), flush=True)
cfg1n = dataclasses.replace(cfg1, remat=False)
print("trace 1 step remat off: %.2f ms" % bench(jax.jit(lambda s,t,ro,rd: trace(s,t,cfg1n,ro,rd)), scene, textures, ro, rd), flush=True)
cfg1g = dataclasses.replace(cfg1, refractive_glossy=False)
print("trace 1 step no glossy: %.2f ms" % bench(jax.jit(lambda s,t,ro,rd: trace(s,t,cfg1g,ro,rd)), scene, textures, ro, rd), flush=True)
