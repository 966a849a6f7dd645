"""The demo scene: the reference's solar-system demo, TPU-native.

Scene construction reproduces main.cpp:43-132 (three shaded spheres, three
textured planets, Saturn's ring, floor + crate boxes, torus, cone and
cylinder quadrics, point + directional light) and the per-frame animation
reproduces update_scene (main.cpp:197-246): planet orbits, planet spin,
ring tracking, box tumble, torus spin.

The reference ships JPEG assets; TXR generates procedural equivalents
(banded gas giants, red planet, alpha-gradient ring, crate, starfield
cubemap) so the demo is self-contained.

Run:  python -m txr.apps.demo --width 640 --height 360 --frames 1 \
          --out /tmp/demo.png
"""

from __future__ import annotations

import argparse
import dataclasses
import math
import time

import numpy as np
import jax.numpy as jnp

from txr.geometry import quaternion as quat
from txr.scene.factories import SceneBuilder
from txr.scene import surface_factory as sf
from txr.render.texture import TextureSet
from txr.render.trace import RenderConfig
from txr.render.render import render_jit

SATURN_RADIUS = 4150.0
# numpy (host) quat: scene construction must never touch the device —
# a single d2h transfer degrades every later dispatch on tunneled TPUs
SATURN_PITCH = quat.from_euler(np.array([math.radians(15.0), 0.0, 0.0]))


# -- procedural textures ---------------------------------------------------

def _banded_planet(h, w, bands, base, alt, seed):
    rng = np.random.default_rng(seed)
    y = np.linspace(0, 1, h)[:, None]
    phase = rng.uniform(0, 2 * np.pi, 3)
    mix = 0.5 + 0.5 * np.sin(bands * 2 * np.pi * y + phase[0])
    mix += 0.15 * np.sin(3.1 * bands * 2 * np.pi * y + phase[1])
    mix = np.clip(mix, 0, 1)
    rgb = np.asarray(base) * (1 - mix[..., None]) + np.asarray(alt) * mix[..., None]
    rgb = np.broadcast_to(rgb, (h, w, 3)).copy()
    rgb += rng.normal(0, 0.01, (h, w, 3))
    a = np.ones((h, w, 1))
    return jnp.asarray(np.clip(np.concatenate([rgb, a], -1), 0, 1), jnp.float32)


def _ring_texture(h, w):
    """Radial bands with alpha gaps; u = normalised (r²−r1)/(r2−r1)."""
    rng = np.random.default_rng(7)
    u = np.linspace(0, 1, w)[None, :]
    color = 0.55 + 0.25 * np.sin(40 * np.pi * u) + rng.normal(0, 0.02, (1, w))
    alpha = np.clip(0.8 + 0.4 * np.sin(23 * np.pi * u + 1.3), 0, 1) * (u > 0.02)
    rgb = np.broadcast_to(color[..., None] * np.array([1.0, 0.9, 0.75]), (h, w, 3))
    a = np.broadcast_to(alpha[..., None], (h, w, 1))
    return jnp.asarray(np.clip(np.concatenate([rgb, a], -1), 0, 1), jnp.float32)


def _crate_texture(h, w):
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    border = (np.minimum.reduce([xx, 1 - xx, yy, 1 - yy]) < 0.08).astype(float)
    planks = 0.5 + 0.2 * np.sin(6 * np.pi * yy)
    rgb = np.stack([0.55 + 0.2 * planks, 0.35 + 0.15 * planks, 0.15 + 0.05 * planks], -1)
    border = border[..., None]
    rgb = rgb * (1 - border) + border * np.array([0.35, 0.22, 0.1])
    a = np.ones((h, w, 1))
    return jnp.asarray(np.concatenate([rgb, a], -1), jnp.float32)


def _starfield_cubemap(size=256, density=4e-4, seed=3):
    rng = np.random.default_rng(seed)
    cm = np.zeros((6, size, size, 4), np.float32)
    cm[..., :3] = rng.uniform(0.0, 0.015, (6, size, size, 3))
    n_stars = int(6 * size * size * density)
    f = rng.integers(0, 6, n_stars)
    y = rng.integers(0, size, n_stars)
    x = rng.integers(0, size, n_stars)
    mag = rng.uniform(0.3, 1.0, n_stars)
    tint = rng.uniform(0.7, 1.0, (n_stars, 3))
    cm[f, y, x, :3] = (mag[:, None] * tint).astype(np.float32)
    cm[..., 3] = 1.0
    return jnp.asarray(cm)


def _find_asset(asset_dir, name):
    import os

    for ext in ("png", "jpg", "jpeg", "bmp"):
        p = os.path.join(asset_dir, f"{name}.{ext}")
        if os.path.exists(p):
            return p
    return None


def demo_textures(asset_dir=None):
    """The demo texture set.  The reference loads 5 JPEGs + a 6-face JPEG
    cubemap from disk (main.cpp:137-153, GLWrapper.cpp:284-354); TXR does
    the same when ``asset_dir`` is given (files jupiter/saturn/mars/ring/
    box.{png,jpg,...} and cubemap_{px,nx,py,ny,pz,nz}.*, any mix), and
    generates procedural equivalents for anything missing so the demo is
    always self-contained."""
    procedural = {
        "jupiter": lambda: _banded_planet(512, 1024, 9, (0.80, 0.64, 0.48),
                                          (0.55, 0.38, 0.28), 1),
        "saturn": lambda: _banded_planet(512, 1024, 6, (0.85, 0.76, 0.55),
                                         (0.70, 0.60, 0.42), 2),
        "mars": lambda: _banded_planet(256, 512, 2, (0.72, 0.35, 0.20),
                                       (0.48, 0.22, 0.14), 3),
        "ring": lambda: _ring_texture(64, 1024),
        "box": lambda: _crate_texture(256, 256),
    }

    def tex(name):
        if asset_dir:
            p = _find_asset(asset_dir, name)
            if p:
                from txr.utils.image import load_image

                return jnp.asarray(load_image(p))
        return procedural[name]()

    cubemap = None
    if asset_dir:
        faces = [_find_asset(asset_dir, f"cubemap_{f}")
                 for f in ("px", "nx", "py", "ny", "pz", "nz")]
        if all(faces):
            from txr.utils.image import load_image

            imgs = [load_image(p) for p in faces]
            side = max(i.shape[0] for i in imgs)
            if any(i.shape[:2] != (side, side) for i in imgs):
                from PIL import Image

                imgs = [
                    np.asarray(
                        Image.fromarray((i * 255).astype(np.uint8)).resize((side, side))
                    ).astype(np.float32) / 255.0
                    for i in imgs
                ]
            cubemap = jnp.asarray(np.stack(imgs))
    if cubemap is None:
        cubemap = _starfield_cubemap()

    return TextureSet(
        sphere=(tex("jupiter"), tex("saturn"), tex("mars")),
        ring=tex("ring"),
        box=tex("box"),
        cubemap=cubemap,
    )


# -- scene (main.cpp:43-132) ----------------------------------------------

@dataclasses.dataclass
class DemoHandles:
    jupiter: int
    saturn: int
    saturn_rings: int
    mars: int
    box: int
    torus: int


def build_scene(width=1280, height=720):
    b = SceneBuilder(camera_pos=(0.0, 0.0, -5.0))
    b.ambient_color = (0.025, 0.025, 0.025)   # main.cpp:48
    b.shadow_ambient = (0.1, 0.1, 0.1)        # main.cpp:47

    b.add_light_point((3, 5, 0), (1, 1, 1), 25.5, radius=0.1)   # main.cpp:51
    b.add_light_direct((3, -1, 1), (1, 1, 1), 1.5)              # main.cpp:52

    # blue / red / transparent spheres (main.cpp:55-62)
    b.add_sphere((2, 0, 6), 1, b.material((0, 0, 1), specular=50, reflect=0.35))
    b.add_sphere((-1, 0, 6), 1, b.material((1, 0, 0), specular=100, reflect=0.1), hollow=True)
    b.add_sphere(
        (0.5, 2, 6), 1,
        b.material((1, 1, 1), specular=200, reflect=0.1, refract=1.125,
                   absorb=(1, 0, 2), diffuse=1.0),
        hollow=True,
    )

    # planets (main.cpp:64-85)
    jupiter = b.add_sphere((0, 0, 0), 5000, b.material((0, 0, 0)), texture=1)
    saturn = b.add_sphere((0, 0, 0), SATURN_RADIUS, b.material((0, 0, 0)), texture=2,
                          quat=tuple(SATURN_PITCH))
    mars = b.add_sphere((0, 0, 0), 500, b.material((0, 0, 0)), texture=3)

    # saturn ring (main.cpp:88-95)
    ring_q = quat.mul(quat.from_axis_angle(np.array([1.0, 0, 0]), math.radians(90.0)), SATURN_PITCH)
    rings = b.add_ring((0, 0, 0), SATURN_RADIUS * 1.1166, SATURN_RADIUS * 2.35,
                       b.material((0, 0, 0)), texture=4, quat=tuple(ring_q))

    # floor + crate (main.cpp:98-105)
    b.add_box((0, -1.2, 6), (10, 0.2, 5), b.material((1, 0.6, 0), specular=100, reflect=0.05))
    box = b.add_box((8, 1, 6), (1, 1, 1), b.material((0.8, 0.7, 0), specular=50), texture=5)

    # torus (main.cpp:110-114)
    tq = quat.from_euler(np.array([math.radians(45.0), 0.0, 0.0]))
    torus = b.add_torus((-9, 0.5, 6), (1.0, 0.5),
                        b.material((0.5, 0.4, 1), specular=200, reflect=0.2),
                        quat=tuple(tq))

    # cone + cylinder quadrics (main.cpp:117-132)
    rq = quat.from_euler(np.array([math.radians(90.0), 0.0, 0.0]))
    b.add_surface(
        sf.elliptic_cone(1 / 3.0, 1 / 3.0, 1.0),
        b.material((234 / 255, 17 / 255, 82 / 255), specular=200, reflect=0.2),
        pos=(-5, 4, 6), quat=tuple(rq),
        v_min=(-3.0e38, -1.0, -3.0e38), v_max=(3.0e38, 4.0, 3.0e38),
    )
    b.add_surface(
        sf.elliptic_cylinder(1 / 2.0, 1 / 2.0),
        b.material((200 / 255, 1.0, 0.0), specular=200, reflect=0.2),
        pos=(5, 0, 6), quat=tuple(rq),
        v_min=(-3.0e38, -1.0, -3.0e38), v_max=(3.0e38, 1.0, 3.0e38),
    )

    handles = DemoHandles(jupiter=jupiter, saturn=saturn, saturn_rings=rings,
                          mars=mars, box=box, torus=torus)
    return b.build(), handles


# -- animation (main.cpp:197-246) ------------------------------------------

def update_scene(scene, handles: DemoHandles, dt, t):
    """Pure function: scene → animated scene.  jit-compatible (dt, t may be
    traced scalars), so an animation loop re-uses the compiled renderer."""
    sp = scene.spheres
    pos = sp.pos
    sq = sp.quat

    # jupiter (main.cpp:199-206)
    j = handles.jupiter
    pos = pos.at[j, 0].set(jnp.cos(t * 0.02) * 20000.0)
    pos = pos.at[j, 2].set(jnp.sin(t * 0.02) * 20000.0)
    sq = sq.at[j].set(quat.mul(sq[j], quat.from_axis_angle(jnp.array([0.0, 1, 0]), dt / 15.0)))

    # saturn + rings (main.cpp:208-223)
    s = handles.saturn
    speed, dist, offset = 0.0082, 35000.0, 1.0
    sx = jnp.cos(t * speed + offset) * dist
    sz = jnp.sin(t * speed + offset) * dist
    pos = pos.at[s, 0].set(sx)
    pos = pos.at[s, 2].set(sz)
    # glm `vec3(0,1,0) * saturn_pitch` rotates by the INVERSE quat
    axis = quat.rotate(quat.inv(SATURN_PITCH), jnp.array([0.0, 1.0, 0.0]))
    sq = sq.at[s].set(quat.mul(sq[s], quat.from_axis_angle(axis, dt / 10.0)))

    rings = scene.rings
    rpos = rings.pos.at[handles.saturn_rings, 0].set(sx)
    rpos = rpos.at[handles.saturn_rings, 2].set(sz)

    # mars (main.cpp:225-232)
    m = handles.mars
    pos = pos.at[m, 0].set(jnp.cos(t * 0.05 + 0.5) * 10000.0)
    pos = pos.at[m, 2].set(jnp.sin(t * 0.05 + 0.5) * 10000.0)
    pos = pos.at[m, 1].set(-jnp.cos(t * 0.05) * 3000.0)
    sq = sq.at[m].set(quat.mul(sq[m], quat.from_axis_angle(jnp.array([0.0, 1, 0]), dt / 5.0)))

    # box tumble (main.cpp:234-239)
    bx = scene.boxes
    bq = bx.quat.at[handles.box].set(
        quat.mul(bx.quat[handles.box],
                 quat.from_axis_angle(jnp.array([0.5774, 0.5774, 0.5774]), dt))
    )

    # torus spin (main.cpp:241-245)
    to = scene.toruses
    tq = to.quat.at[handles.torus].set(
        quat.mul(to.quat[handles.torus], quat.from_axis_angle(jnp.array([0.0, 1, 0]), dt))
    )

    return dataclasses.replace(
        scene,
        spheres=dataclasses.replace(sp, pos=pos, quat=sq),
        rings=dataclasses.replace(rings, pos=rpos),
        boxes=dataclasses.replace(bx, quat=bq),
        toruses=dataclasses.replace(to, quat=tq),
    )


def parse_flight(script):
    """Flight script → list of per-frame (keys, dx, dy).

    Comma-separated segments ``<keys>:<frames>[:<dx>:<dy>]`` — keys is any
    subset of ``wasd`` plus ``_`` for none, dx/dy is a per-frame mouse-look
    delta in the reference's pixel units (sensitivity 0.05°/px,
    SceneManager.cpp:124).  e.g. ``w:30, wd:20:4:0, _:15:0:-2``."""
    frames = []
    for seg in script.split(","):
        seg = seg.strip()
        if not seg:
            continue
        parts = seg.split(":")
        keys = parts[0].replace("_", "")
        n = int(parts[1])
        dx = float(parts[2]) if len(parts) > 2 else 0.0
        dy = float(parts[3]) if len(parts) > 3 else 0.0
        frames += [(keys, dx, dy)] * n
    return frames


def main(argv=None):
    p = argparse.ArgumentParser(description="TXR solar-system demo")
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--frames", type=int, default=1)
    p.add_argument("--dt", type=float, default=1 / 30)
    p.add_argument("--t0", type=float, default=60.0)
    p.add_argument("--supersample", type=int, default=1)
    p.add_argument("--aa", choices=("off", "low", "medium", "high", "ultra"),
                   default=None,
                   help="quality preset (reference SMAA presets → SSAA factor);"
                        " overrides --supersample")
    p.add_argument("--iterations", type=int, default=None,
                   help="bounce depth (default: the scene's reflect_depth, 5)")
    p.add_argument("--out", default="/tmp/txr_demo.png",
                   help=".png (last frame) or .gif (all frames animated)")
    p.add_argument("--frames-dir", default=None,
                   help="also dump every frame as PNG into this directory")
    p.add_argument("--assets", default=None,
                   help="directory of texture files (jupiter/saturn/mars/"
                        "ring/box.*, cubemap_{px,nx,py,ny,pz,nz}.*); "
                        "missing ones fall back to procedural")
    p.add_argument("--fly", default=None,
                   help="FlyCamera flight script, e.g. 'w:30, wd:20:4:0' "
                        "(see parse_flight)")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans/_infs sanitizers (slow)")
    p.add_argument("--profile", default=None, metavar="LOGDIR",
                   help="dump a jax.profiler xplane trace of the frame loop")
    args = p.parse_args(argv)

    if args.debug_nans:
        from txr.utils.debug import enable_nan_checks

        enable_nan_checks()

    scene, handles = build_scene(args.width, args.height)
    import jax

    from txr.render.texture import with_mips

    # atlases built once at load (glGenerateMipmap, GLWrapper.cpp:343) —
    # outside the render jit they keep gather-friendly default layouts
    textures = jax.jit(with_mips)(demo_textures(args.assets))
    iters = args.iterations if args.iterations is not None else scene.reflect_depth
    from txr.render.trace import auto_refraction_steps

    cfg = RenderConfig(width=args.width, height=args.height,
                       iterations=iters, supersample=args.supersample,
                       extra_refraction_steps=auto_refraction_steps(scene))
    if args.aa:
        cfg = cfg.with_aa_preset(args.aa)

    flight = parse_flight(args.fly) if args.fly else None
    cam = None
    if flight:
        from txr.scene.camera import FlyCamera

        cam = FlyCamera(position=tuple(np.asarray(scene.camera.pos)))

    if args.frames_dir:
        import os

        os.makedirs(args.frames_dir, exist_ok=True)

    gif_frames = []
    want_gif = args.out.lower().endswith(".gif")
    t = args.t0
    last = time.perf_counter()

    profile_cm = None
    if args.profile:
        from txr.utils.profiling import profile_trace

        profile_cm = profile_trace(args.profile)
        profile_cm.__enter__()

    for frame in range(args.frames):
        animated = update_scene(scene, handles, args.dt, t)
        if cam is not None:
            keys, dx, dy = flight[min(frame, len(flight) - 1)]
            for k in "wasd":
                cam.key(k, k in keys)
            if dx or dy:
                cam.mouse(dx, dy)
            cam.update(args.dt)
            animated = cam.apply(animated)
        img = render_jit(animated, textures, cfg)
        img.block_until_ready()
        now = time.perf_counter()
        fps = 1.0 / max(now - last, 1e-9)
        last = now
        print(f"frame {frame}: {fps:.1f} FPS "
              f"({args.width * args.height * cfg.supersample**2 * fps:,.0f} rays/s)")
        t += args.dt

        if want_gif or args.frames_dir:
            from txr.utils.image import to_uint8

            u8 = to_uint8(np.array(img))
            if want_gif:
                gif_frames.append(u8)
            if args.frames_dir:
                from txr.utils.image import save_png

                save_png(f"{args.frames_dir}/frame_{frame:05d}.png", u8)

    if profile_cm is not None:
        profile_cm.__exit__(None, None, None)
        print(f"profile trace in {args.profile}")

    from PIL import Image

    if want_gif:
        imgs = [Image.fromarray(f) for f in gif_frames]
        imgs[0].save(args.out, save_all=True, append_images=imgs[1:],
                     duration=max(int(args.dt * 1000), 20), loop=0)
    else:
        out = np.clip(np.array(img), 0.0, 1.0)
        Image.fromarray((out * 255).astype(np.uint8)).save(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
