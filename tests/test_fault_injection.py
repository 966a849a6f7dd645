"""Fault injection: SIGKILL an inverse-rendering run mid-optimisation and
prove resume-from-checkpoint equivalence (SURVEY §5 "failure detection /
fault injection"; VERDICT r3 next-round item 6).

The reference fail-fasts with exit() on any error and has no recovery
(shader.h:176, utils.h:62); TXR's recovery contract is restart-world: a new
process resumes from the last periodic checkpoint and must reproduce the
uninterrupted run exactly (checkpointing is deterministic: same target, same
step schedule, bit-identical optimizer state round-trip)."""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

_WORKER = """
import sys
import numpy as np
from txr.apps.inverse import make_scene, QUAT_NORMALIZE
from txr.render.texture import TextureSet
from txr.render.trace import RenderConfig
from txr.render.render import render_jit
from txr.diff import optimize_scene

ckpt, steps, resume, out, ready = sys.argv[1:6]
cfg = RenderConfig(width=24, height=24, iterations=2, refractive_glossy=False)
tex = TextureSet()
target = render_jit(
    make_scene((0.3, 0.2, 6.0), 1.0, (0.1, 0.2, 0.9), (0, 0, -5)), tex, cfg)
guess = make_scene((-0.4, -0.3, 6.5), 0.8, (0.5, 0.5, 0.5), (0.3, 0.2, -5.2))

def on_step(i, _scene, _val):
    # signal test readiness once step 10's checkpoint exists, then crawl so
    # the parent's SIGKILL lands mid-optimisation, between steps
    if ready != "-" and i + 1 >= 10:
        if i + 1 == 10:
            open(ready, "w").write("ok")
        import time
        time.sleep(0.4)

recovered, losses = optimize_scene(
    guess, tex, cfg, target, steps=int(steps), lr=2e-2,
    param_paths=["spheres.pos", "spheres.radius", "camera.pos"],
    checkpoint_path=ckpt, checkpoint_every=2,
    resume=(resume == "1"), callback=on_step,
)
np.savez(out, losses=np.array(losses),
         pos=np.array(recovered.spheres.pos),
         cam=np.array(recovered.camera.pos))
print("DONE")
"""


def test_sigkill_and_resume_matches_uninterrupted(tmp_path):
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(ckpt, steps, resume, out, ready="-", kill_after_ready=False):
        p = subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(ckpt), str(steps),
             resume, str(out), str(ready)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        if kill_after_ready:
            deadline = time.time() + 300
            while time.time() < deadline and not os.path.exists(ready):
                if p.poll() is not None:
                    so, se = p.communicate()
                    raise AssertionError(
                        f"worker exited before kill point:\n{so}\n{se}")
                time.sleep(0.05)
            assert os.path.exists(ready), "worker never reached the kill point"
            p.send_signal(signal.SIGKILL)
            p.wait(timeout=60)
            return None
        so, se = p.communicate(timeout=600)
        assert p.returncode == 0 and "DONE" in so, f"{so}\n{se}"
        return np.load(out)

    # 1. uninterrupted 14-step reference run
    ref = run(tmp_path / "ref.npz", 14, "0", tmp_path / "ref_out.npz")

    # 2. same run, SIGKILLed after step 10's checkpoint (mid-optimisation)
    ready = tmp_path / "ready"
    run(tmp_path / "inv.npz", 14, "0", tmp_path / "dead_out.npz",
        ready=ready, kill_after_ready=True)
    assert os.path.exists(tmp_path / "inv.npz"), "no checkpoint survived the kill"
    assert not os.path.exists(tmp_path / "dead_out.npz")

    # 3. fresh process resumes from the surviving checkpoint
    res = run(tmp_path / "inv.npz", 14, "1", tmp_path / "res_out.npz")

    # loss trajectory continues and the final state matches the
    # uninterrupted run
    assert len(res["losses"]) == len(ref["losses"]) == 14
    np.testing.assert_allclose(res["losses"], ref["losses"], rtol=1e-6)
    np.testing.assert_allclose(res["pos"], ref["pos"], rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(res["cam"], ref["cam"], rtol=1e-6, atol=1e-7)
