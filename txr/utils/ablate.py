"""Ablation kill-switches for perf attribution (scripts/fetch_decomp.py).

Env vars TXR_ABL_<NAME>=1 disable individual texture-fetch classes so their
frame cost can be measured by difference.  Render output is WRONG with any
switch set — these exist only for the measurement campaign (the reference's
analog is commenting out shader passes, e.g. the torus advice in
main.cpp:107-108).  Read at trace time: each bench run is a fresh process.

A stray TXR_ABL_* in the environment would silently corrupt every render,
so the first query that sees ANY switch set prints a loud one-time warning
(ADVICE r4).
"""

from __future__ import annotations

import os
import sys

_warned = False


def ablated(name: str) -> bool:
    global _warned
    if not _warned:
        active = sorted(k for k in os.environ
                        if k.startswith("TXR_ABL_") and os.environ[k])
        if active:
            print(
                "*** TXR ABLATION SWITCHES ACTIVE: "
                + ", ".join(active)
                + " — render output is WRONG (perf-attribution mode) ***",
                file=sys.stderr,
            )
        _warned = True
    return bool(os.environ.get("TXR_ABL_" + name.upper()))
