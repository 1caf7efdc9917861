#!/usr/bin/env python3
"""Itemize the sync copy/transpose (relayout) bucket of an xplane trace.

Round-3 closure of the last open device-time category (docs/PERF.md "The
sync-relayout bucket is diffuse"): groups per-op SELF time (same nesting
logic as analyze_xplane.py) for ops categorized copy/transpose, by op
signature, so a head-vs-tail read is possible. On the finest-image-scale
chunk the bucket is 344 distinct ops with no op above 1.7% of the step.

Usage: python scripts/copy_breakdown.py PROFILE_DIR [--top N]
"""

from __future__ import annotations

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from analyze_xplane import categorize, load_xplane_pb2, newest_xplane  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("profile_dir")
    ap.add_argument("--top", type=int, default=30)
    a = ap.parse_args()

    path = newest_xplane(a.profile_dir)
    print("parsing:", path)
    xp = load_xplane_pb2()
    space = xp.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    plane = [p for p in space.planes if "TPU" in p.name][0]
    meta = {k: v.name for k, v in plane.event_metadata.items()}
    line = [l for l in plane.lines if l.name == "XLA Ops"][0]
    evs = sorted(((e.offset_ps, e.duration_ps, meta.get(e.metadata_id, "?"))
                  for e in line.events))

    # self-time via the nesting stack (see analyze_xplane.py)
    evs_nest = sorted(((o, -d, name) for o, d, name in evs))
    stack, selfs = [], []
    for o, nd, name in evs_nest:
        d = -nd
        while stack and stack[-1][0] <= o:
            stack.pop()
        if stack:
            selfs[stack[-1][1]][1] -= d
        selfs.append([name, d])
        stack.append((o + d, len(selfs) - 1))

    per_op = collections.Counter()
    per_op_n = collections.Counter()
    tot = 0
    for name, s in selfs:
        if categorize(name) != "copy/transpose":
            continue
        s = max(s, 0)
        sig = name[:160]
        per_op[sig] += s
        per_op_n[sig] += 1
        tot += s
    print(f"total copy/transpose self time: {tot/1e9:.2f} ms over "
          f"{sum(per_op_n.values())} events, {len(per_op)} distinct ops")
    cum = 0
    for sig, d in per_op.most_common(a.top):
        cum += d
        print(f"{d/1e9:8.3f} ms  n={per_op_n[sig]:4d}  "
              f"cum={100*cum/max(tot,1):5.1f}%  {sig}")


if __name__ == "__main__":
    main()
