"""Ablation kill-switches for perf attribution (scripts/fetch_decomp.py).

Env vars TXR_ABL_<NAME>=1 disable individual texture-fetch classes so their
frame cost can be measured by difference.  Render output is WRONG with any
switch set — these exist only for the measurement campaign (the reference's
analog is commenting out shader passes, e.g. the torus advice in
main.cpp:107-108).  Read at trace time: each bench run is a fresh process.
"""

from __future__ import annotations

import os


def ablated(name: str) -> bool:
    return bool(os.environ.get("TXR_ABL_" + name.upper()))
