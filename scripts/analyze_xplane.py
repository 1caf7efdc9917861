#!/usr/bin/env python3
"""Device-time accounting from a jax.profiler xplane trace.

VERDICT round-2 item 2: close the MFU case with POSITIVE accounting — for a
profiled training chunk, report per-category device-busy time (convolution /
other fusions / copies / collectives), the idle gaps between ops on the
device timeline, and the busy fraction of the span.

Usage:
  python scripts/analyze_xplane.py PROFILE_DIR [--top N]

PROFILE_DIR is the --profile-dir handed to the train CLI or
jax.profiler.trace(); the newest plugins/profile/*/ *.xplane.pb under it is
parsed. Works with the TPU device plane (axon names it like a local TPU).

The xplane_pb2 proto is loaded standalone from the installed tensorflow
wheel (importlib, no `import tensorflow` — the full TF import is slow on
this host and unnecessary).
"""

from __future__ import annotations

import argparse
import collections
import glob
import importlib.util
import os
import sys


def load_xplane_pb2():
    for base in sys.path:
        cand = os.path.join(base, "tensorflow", "tsl", "profiler", "protobuf",
                            "xplane_pb2.py")
        if os.path.exists(cand):
            spec = importlib.util.spec_from_file_location("xplane_pb2", cand)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            return mod
    raise RuntimeError("xplane_pb2.py not found in the tensorflow wheel")


def newest_xplane(profile_dir: str) -> str:
    pats = [os.path.join(profile_dir, "plugins", "profile", "*", "*.xplane.pb"),
            os.path.join(profile_dir, "**", "*.xplane.pb")]
    files = []
    for p in pats:
        files += glob.glob(p, recursive=True)
    if not files:
        raise FileNotFoundError(f"no *.xplane.pb under {profile_dir}")
    return max(files, key=os.path.getmtime)


CATEGORIES = (
    ("convolution", ("convolution", "conv")),
    ("collective", ("all-reduce", "all-gather", "reduce-scatter",
                    "collective", "psum")),
    ("async-copy (DMA)", ("copy-start", "copy-done")),
    ("copy/transpose", ("copy", "transpose", "bitcast")),
    ("dynamic-slice/update", ("dynamic-slice", "dynamic_update",
                              "dynamic-update")),
    ("rng", ("rng",)),
    ("reduce fusion", ("reduce",)),
    ("fusion/elementwise", ("fusion", "loop_", "input_", "output_",
                            "scatter", "select", "broadcast", "add",
                            "multiply", "subtract", "divide")),
)


def categorize(name: str) -> str:
    # categorize by the INSTRUCTION name only ("%op.123 = ..."), never the
    # full HLO text — operand lists mention producer names ("fusion(...
    # %copy.4 ...)") and misattribute fusions to the copy bucket.
    n = name.split(" = ")[0].lower().lstrip("%")
    for cat, keys in CATEGORIES:
        if any(k in n for k in keys):
            return cat
    return "other"


def analyze(path: str, top: int = 25):
    xp = load_xplane_pb2()
    space = xp.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())

    dev_planes = [p for p in space.planes
                  if "TPU" in p.name or "/device:" in p.name.upper()]
    dev_planes = [p for p in dev_planes if "CPU" not in p.name.upper()] \
        or dev_planes
    if not dev_planes:
        print("planes found:", [p.name for p in space.planes])
        raise RuntimeError("no device plane in trace")

    for plane in dev_planes:
        print(f"\n=== plane: {plane.name} (lines: {len(plane.lines)}) ===")
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if not line.events:
                continue
            evs = sorted(((e.offset_ps, e.duration_ps,
                           meta.get(e.metadata_id, "?"))
                          for e in line.events))
            t0 = evs[0][0]
            t1 = max(o + d for o, d, _ in evs)
            span = t1 - t0
            # merge busy intervals (events can nest/overlap inside fusions)
            busy = 0
            cur_s, cur_e = evs[0][0], evs[0][0] + evs[0][1]
            gaps = []
            for o, d, _ in evs[1:]:
                if o <= cur_e:
                    cur_e = max(cur_e, o + d)
                else:
                    busy += cur_e - cur_s
                    gaps.append((cur_e, o - cur_e))
                    cur_s, cur_e = o, o + d
            busy += cur_e - cur_s

            # SELF time: events nest (while/fusion wrappers span their
            # bodies) — naive duration sums double-count, so subtract each
            # event's direct children. evs is offset-sorted; ties put the
            # longer (outer) event first.
            evs_nest = sorted(((o, -d, name) for o, d, name in evs))
            per_cat = collections.Counter()
            per_cat_n = collections.Counter()
            per_op = collections.Counter()
            n_ev = 0
            stack = []  # (end_ps, self_ps_accum_index)
            selfs = []
            for o, nd, name in evs_nest:
                d = -nd
                while stack and stack[-1][0] <= o:
                    stack.pop()
                if stack:
                    selfs[stack[-1][1]][1] -= d  # child time off the parent
                selfs.append([name, d])
                stack.append((o + d, len(selfs) - 1))
            for name, s in selfs:
                s = max(s, 0)
                per_cat[categorize(name)] += s
                per_cat_n[categorize(name)] += 1
                per_op[name] += s
                n_ev += 1
            print(f"\n-- line: {line.name!r}  events={n_ev}  "
                  f"span={span/1e9:.3f} ms  busy={busy/1e9:.3f} ms "
                  f"({100*busy/max(span,1):.1f}%)  "
                  f"idle-gaps={(span-busy)/1e9:.3f} ms")
            total_cat = sum(per_cat.values())
            for cat, d in per_cat.most_common():
                n = per_cat_n[cat]
                print(f"   {cat:24s} {d/1e9:9.3f} ms  "
                      f"{100*d/max(total_cat,1):5.1f}%  "
                      f"({n} evs, avg {d/max(n,1)/1e6:.1f} us)")
            biggest = sorted(gaps, key=lambda g: -g[1])[:5]
            if biggest:
                print("   largest gaps (ms):",
                      ", ".join(f"{d/1e9:.4f}" for _, d in biggest))
            print(f"   top {top} ops by device time:")
            for name, d in per_op.most_common(top):
                print(f"     {d/1e9:9.4f} ms  {name[:110]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("profile_dir")
    ap.add_argument("--top", type=int, default=25)
    a = ap.parse_args()
    f = newest_xplane(a.profile_dir)
    print("parsing:", f)
    analyze(f, top=a.top)
