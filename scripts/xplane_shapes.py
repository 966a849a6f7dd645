"""Group leaf-op device time by (op kind, result shape) from the last
xplane capture — quantifies WHICH arrays the broadcast/copy time goes to.

Usage: python scripts/xplane_shapes.py [logdir]
"""

from __future__ import annotations

import glob
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.profile_ops import load_xplane  # noqa: E402
from scripts.xplane_leaf import _WRAP, norm  # noqa: E402

_SHAPE = re.compile(r"=\s*\(?([a-z0-9]+\[[^\]]*\])")


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/txr_xplane"
    pbs = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    pbs.sort(key=os.path.getmtime)
    xs = load_xplane(pbs[-1])
    for plane in xs.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            agg = defaultdict(lambda: [0.0, 0])
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                if _WRAP.match(name):
                    continue
                m = _SHAPE.search(name)
                shape = m.group(1) if m else "?"
                agg[(norm(name), shape)][0] += ev.duration_ps / 1e9
                agg[(norm(name), shape)][1] += 1
            total = sum(v[0] for v in agg.values())
            print(f"== {plane.name}/{line.name}: {total:.1f} ms")
            for (op, shape), (ms, n) in sorted(
                    agg.items(), key=lambda kv: -kv[1][0])[:60]:
                print(f"  {ms:9.2f} ms  x{n:6d}  {op:34s} {shape}")


if __name__ == "__main__":
    main()
