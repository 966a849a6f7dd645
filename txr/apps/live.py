"""Interactive live viewer — the reference's windowed product loop
(main.cpp:162-191 + SceneManager GLFW input, SceneManager.cpp:76-135),
re-imagined for a headless TPU host:

  * frames stream to any browser as MJPEG over localhost HTTP
    (GET / for a viewer page, /stream for the multipart stream);
  * WASD/mouse-look input arrives on the SAME socket (the viewer page posts
    key/pointer events to /input), driving the FlyCamera state machine —
    the same controller the reference binds to GLFW callbacks;
  * the render loop is the animated demo scene (update_scene parity) with
    the fly camera composed in, jitted once and re-invoked per frame.

Run on the TPU host:   python -m txr.apps.live --width 480 --height 270
then open the printed URL (ssh -L the port when remote).
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>txr live</title><style>
 body { background:#111; color:#ccc; font-family:monospace; text-align:center }
 img { image-rendering:pixelated; width:75vw; outline:none }
</style></head>
<body>
<h3>txr live viewer &mdash; click the image, then WASD/space/ctrl + drag to look, shift = fast</h3>
<img id="v" src="/stream" tabindex="0">
<div id="s"></div>
<script>
const v = document.getElementById('v');
const keys = {};
let dragging = false, lastx = 0, lasty = 0;
function post(o) { fetch('/input', {method:'POST', body: JSON.stringify(o)}); }
setInterval(() => { post({keys: Object.keys(keys).filter(k => keys[k])}); }, 50);
window.addEventListener('keydown', e => { keys[e.key.toLowerCase()] = true; });
window.addEventListener('keyup',   e => { keys[e.key.toLowerCase()] = false; });
v.addEventListener('mousedown', e => { dragging = true; lastx = e.clientX; lasty = e.clientY; });
window.addEventListener('mouseup', () => dragging = false);
window.addEventListener('mousemove', e => {
  if (!dragging) return;
  post({look: [e.clientX - lastx, e.clientY - lasty]});
  lastx = e.clientX; lasty = e.clientY;
});
</script></body></html>"""


class _State:
    def __init__(self):
        self.lock = threading.Lock()
        self.frame = b""          # latest JPEG bytes
        self.cond = threading.Condition(self.lock)
        self.keys = set()
        self.look = [0.0, 0.0]    # accumulated mouse deltas
        self.fps = 0.0

    def put(self, jpg):
        with self.cond:
            self.frame = jpg
            self.cond.notify_all()

    def get(self, timeout=1.0):
        with self.cond:
            self.cond.wait(timeout)
            return self.frame


def _make_handler(state: _State):
    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path == "/stream":
                self.send_response(200)
                self.send_header(
                    "Content-Type",
                    "multipart/x-mixed-replace; boundary=frame")
                self.end_headers()
                try:
                    while True:
                        jpg = state.get()
                        if not jpg:
                            continue
                        self.wfile.write(b"--frame\r\n")
                        self.send_header("Content-Type", "image/jpeg")
                        self.send_header("Content-Length", str(len(jpg)))
                        self.end_headers()
                        self.wfile.write(jpg)
                        self.wfile.write(b"\r\n")
                except (BrokenPipeError, ConnectionResetError):
                    return
            else:
                body = _PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        def do_POST(self):
            if self.path != "/input":
                self.send_response(404)
                self.end_headers()
                return
            n = int(self.headers.get("Content-Length", 0))
            try:
                msg = json.loads(self.rfile.read(n) or b"{}")
            except Exception:
                msg = {}
            with state.lock:
                if "keys" in msg:
                    state.keys = set(msg["keys"])
                if "look" in msg:
                    state.look[0] += float(msg["look"][0])
                    state.look[1] += float(msg["look"][1])
            self.send_response(204)
            self.end_headers()

    return H


def _encode_jpeg(img, quality=85):
    from PIL import Image

    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--height", type=int, default=270)
    ap.add_argument("--port", type=int, default=8787)
    ap.add_argument("--iterations", type=int, default=None)
    ap.add_argument("--no-animate", action="store_true")
    ap.add_argument("--max-seconds", type=float, default=0,
                    help="exit after this many seconds (0 = run forever)")
    args = ap.parse_args(argv)

    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("TXR_COMPILE_CACHE", "/root/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from txr.apps.demo import build_scene, demo_textures, update_scene
    from txr.render.trace import RenderConfig, auto_refraction_steps
    from txr.scene.camera import FlyCamera

    import dataclasses as dc

    import jax.numpy as jnp

    from txr.render.render import render
    from txr.scene.types import Camera

    scene0, handles = build_scene(args.width, args.height)
    from txr.render.texture import with_mips

    # atlases built once at load (glGenerateMipmap moment) — outside the
    # frame jit they keep the fast default layouts and drop the per-frame
    # mip rebuild entirely
    textures = jax.jit(with_mips)(demo_textures())
    iters = args.iterations if args.iterations is not None else scene0.reflect_depth
    cfg = RenderConfig(width=args.width, height=args.height, iterations=iters,
                       extra_refraction_steps=auto_refraction_steps(scene0))

    # ONE jitted call per frame: animation + camera pose + render fused into
    # a single dispatch (eager per-op dispatch through the TPU tunnel is the
    # frame-loop bottleneck, not the render).  The frame returns uint8 —
    # device→host rides the ~40 MB/s tunnel, so shipping u8 instead of f32
    # quarters the per-frame transfer.
    @jax.jit
    def frame(scene0, textures, t, cam_pos, cam_quat):
        s = scene0 if args.no_animate else update_scene(
            scene0, handles, jnp.float32(0.0), t)
        s = dc.replace(s, camera=Camera(pos=cam_pos, quat=cam_quat))
        img = render(s, textures, cfg)
        return (jnp.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)

    cam = FlyCamera(position=tuple(np.asarray(scene0.camera.pos)))
    state = _State()
    server = ThreadingHTTPServer(("127.0.0.1", args.port), _make_handler(state))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    print(f"live viewer: http://127.0.0.1:{args.port}/  "
          f"({args.width}x{args.height}, {cfg.max_steps}-step budget)")

    # map browser keys onto the reference's GLFW bindings
    # (SceneManager.cpp:76-101: WASD move, space up, ctrl down, shift fast)
    key_map = {"w": "w", "a": "a", "s": "s", "d": "d",
               " ": "space", "control": "ctrl", "shift": "shift",
               "alt": "alt"}

    all_keys = ("w", "a", "s", "d", "space", "ctrl", "shift", "alt")
    t0 = time.time()
    frames = 0
    last = t0
    fps = 0.0
    pending = None   # frame pipelining: device renders N+1 while the host
    #                  reads back + JPEG-encodes + streams frame N (jax
    #                  dispatch is async; np.asarray forces only `pending`)
    try:
        while True:
            now = time.time()
            dt, last = now - last, now
            with state.lock:
                pressed = {key_map[k] for k in state.keys if k in key_map}
                dx, dy = state.look
                state.look[0] = state.look[1] = 0.0
            # browser y grows downward; the reference's mouse dy means
            # look-up (SceneManager.cpp:110-135)
            cam.mouse(dx, -dy)
            for k in all_keys:
                cam.key(k, k in pressed)
            cam.update(dt)
            t = np.float32(0.0 if args.no_animate else now - t0)
            new = frame(scene0, textures, t, cam.pos, cam.quat)  # async
            if pending is not None:
                state.put(_encode_jpeg(np.asarray(pending)))
                frames += 1
            pending = new
            fps = 0.9 * fps + 0.1 / max(dt, 1e-6) if frames > 1 else 1.0 / max(dt, 1e-6)
            state.fps = fps
            if frames and frames % 30 == 0:
                print(f"  {frames} frames, {fps:.1f} FPS")
            if args.max_seconds and now - t0 > args.max_seconds:
                break
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
    el = time.time() - t0
    print(f"live viewer: {frames} frames in {el:.1f}s = {frames/max(el,1e-6):.1f} FPS avg")


if __name__ == "__main__":
    main()
