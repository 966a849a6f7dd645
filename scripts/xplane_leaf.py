"""Leaf-op (exclusive) attribution from an existing xplane capture.

profile_ops.py's aggregate view sums INCLUSIVE spans, so nested
cond/while wrappers dominate the listing.  This tool re-parses the last
capture and attributes device time to leaf ops only (fusion kernels,
copies, gathers, custom-calls), grouped by a normalized name, so the
top of the list is actual work, not control flow.

Usage: python scripts/xplane_leaf.py [logdir] [top_n]
"""

from __future__ import annotations

import glob
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.profile_ops import load_xplane  # noqa: E402

_WRAP = re.compile(r"^%?(while|cond|conditional|jit_|\d+$)")


def norm(name: str) -> str:
    # strip the %op.NNN counter so repeated instances group together
    m = re.match(r"^%?([a-zA-Z][\w-]*)\.\d+", name)
    return m.group(1) if m else name


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/txr_xplane"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 45
    pbs = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    pbs.sort(key=os.path.getmtime)
    assert pbs, f"no xplane capture under {logdir}"
    xs = load_xplane(pbs[-1])
    for plane in xs.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            agg = defaultdict(lambda: [0.0, 0])
            detail = defaultdict(lambda: [0.0, 0])
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                if _WRAP.match(name):
                    continue
                agg[norm(name)][0] += ev.duration_ps / 1e9
                agg[norm(name)][1] += 1
                detail[name[:140]][0] += ev.duration_ps / 1e9
                detail[name[:140]][1] += 1
            total = sum(v[0] for v in agg.values())
            if total < 1.0:
                continue
            print(f"\n== plane {plane.name} line {line.name}: "
                  f"{total:.1f} ms leaf total")
            for name, (ms, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:18]:
                print(f"  {ms:9.2f} ms  x{n:6d}  {name}")
            print("  -- top individual ops --")
            for name, (ms, n) in sorted(
                    detail.items(), key=lambda kv: -kv[1][0])[:top_n]:
                print(f"  {ms:9.2f} ms  x{n:6d}  {name}")


if __name__ == "__main__":
    main()
