"""Tracing / profiling (SURVEY §5).

The reference's only instrumentation is a once-per-second FPS print
(main.cpp:169-174).  TXR provides:

  * ``FrameTimer`` — fenced per-phase wall timers + rays/s counters (the
    FPS-counter equivalent, but correct: every sample is
    ``block_until_ready`` fenced so async dispatch can't lie)
  * ``profile_trace`` — a context manager around ``jax.profiler`` producing
    an xplane trace for TensorBoard / xprof
"""

from __future__ import annotations

import contextlib
import time

import jax


class FrameTimer:
    """Fenced frame timing with a once-per-interval report, like the
    reference FPS counter but device-synchronised."""

    def __init__(self, rays_per_frame=0, interval=1.0, log=print):
        self.rays = rays_per_frame
        self.interval = interval
        self.log = log
        self._count = 0
        self._t0 = None
        self.history = []

    def frame(self, *results):
        jax.block_until_ready(results)
        now = time.perf_counter()
        if self._t0 is None:
            self._t0 = now
            return
        self._count += 1
        dt = now - self._t0
        if dt >= self.interval:
            fps = self._count / dt
            self.history.append(fps)
            msg = f"FPS: {fps:.1f}"
            if self.rays:
                msg += f"  ({self.rays * fps:,.0f} rays/s)"
            self.log(msg)
            self._t0 = now
            self._count = 0


@contextlib.contextmanager
def profile_trace(logdir="/tmp/txr_profile"):
    """Dump an xplane trace viewable in TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(name, sink=None, log=print):
    """Fenced wall-clock timer for a code block."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink[name] = dt
    else:
        log(f"{name}: {dt * 1e3:.2f} ms")
