"""Inverse-rendering example (BASELINE config 4): recover primitive
parameters AND the camera pose from a target image by pixel-gradient
descent.

Run:  python -m txr.apps.inverse --steps 200 --out /tmp/inverse.png
Resumable: --checkpoint /tmp/inv.npz --checkpoint-every 20 --resume
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np
import jax.numpy as jnp

from txr.scene.factories import SceneBuilder
from txr.render.texture import TextureSet
from txr.render.trace import RenderConfig
from txr.render.render import render_jit
from txr.diff import optimize_scene


# optimise the camera quat through a normalise: the renderer's rotate()
# follows the reference (conjugate, not inverse — rt.frag:305-311), so a
# non-unit quat scales the rotation; normalising keeps descent on the
# rotation manifold
QUAT_NORMALIZE = {
    "camera.quat": lambda q: q / jnp.sqrt(jnp.sum(q * q) + 1e-12)
}


def make_scene(sphere_pos, sphere_radius, color, cam_pos, cam_quat=(0, 0, 0, 1)):
    b = SceneBuilder(camera_pos=cam_pos)
    b.ambient_color = (0.05,) * 3
    b.shadow_ambient = (0.1,) * 3
    b.add_light_point((3, 5, -2), (1, 1, 1), 25.5)
    b.add_sphere(sphere_pos, sphere_radius, b.material(color, specular=50, reflect=0.0))
    b.add_box((0, -1.5, 6), (10, 0.2, 8), b.material((0.6, 0.6, 0.65), specular=20))
    scene = b.build()
    return dataclasses.replace(
        scene,
        camera=dataclasses.replace(
            scene.camera, quat=jnp.asarray(cam_quat, jnp.float32)
        ),
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--lr", type=float, default=3e-2)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--out", default="/tmp/txr_inverse.png")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    args = p.parse_args(argv)

    cfg = RenderConfig(width=args.size, height=args.size, iterations=2,
                       refractive_glossy=False)
    tex = TextureSet()

    target_scene = make_scene((0.3, 0.2, 6.0), 1.0, (0.1, 0.2, 0.9), (0, 0, -5))
    target = render_jit(target_scene, tex, cfg)

    # perturbed initial guess: wrong sphere AND wrong camera pose
    guess = make_scene(
        (-0.4, -0.3, 6.5), 0.8, (0.5, 0.5, 0.5),
        (0.3, 0.2, -5.2), cam_quat=(0.0, 0.02, 0.0, 1.0),
    )

    import optax

    recovered, losses = optimize_scene(
        guess, tex, cfg, target, steps=args.steps,
        optimizer=optax.adam(
            optax.exponential_decay(args.lr, max(args.steps // 4, 1), 0.4)
        ),
        param_paths=[
            "spheres.pos", "spheres.radius", "spheres.mat.color",
            "camera.pos", "camera.quat",
        ],
        param_transform=QUAT_NORMALIZE,
        checkpoint_path=args.checkpoint,
        checkpoint_every=args.checkpoint_every,
        resume=args.resume,
    )
    print(f"loss: {losses[0]:.5f} -> {losses[-1]:.6f}")
    print("true pos  ", np.array(target_scene.spheres.pos[0]))
    print("recovered ", np.array(recovered.spheres.pos[0]))
    print("true radius", float(target_scene.spheres.radius[0]),
          " recovered", float(recovered.spheres.radius[0]))
    print("true color", np.array(target_scene.spheres.mat.color[0]))
    print("recovered ", np.array(recovered.spheres.mat.color[0]))
    print("true cam   ", np.array(target_scene.camera.pos),
          np.array(target_scene.camera.quat))
    print("recovered  ", np.array(recovered.camera.pos),
          np.array(recovered.camera.quat))

    from PIL import Image

    final = render_jit(recovered, tex, cfg)
    strip = np.concatenate(
        [np.array(target), np.ones((args.size, 2, 3)), np.array(final)], axis=1
    )
    Image.fromarray((np.clip(strip, 0, 1) * 255).astype(np.uint8)).save(args.out)
    print(f"wrote {args.out}  (left: target, right: recovered)")
    return losses


if __name__ == "__main__":
    main()
