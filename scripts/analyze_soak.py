#!/usr/bin/env python3
"""Sustained-run (soak) analysis from a training logbook.

Parses the periodic `[Scale K/Iter N]` logbook lines (utils/logger.py
LOGBOOK level) and reports, per scale: total iterations, wall clock,
sustained it/s, the per-interval rate series with quartile medians (drift
check), and metric health (non-finite losses). VERDICT round-2 item 5:
evidence that throughput does not drift and the logbook contract holds
over thousands of chunk dispatches.

Usage: python scripts/analyze_soak.py LOGBOOK [--scale K] [--watchdog LOG]
"""

import argparse
import datetime
import math
import re

LINE = re.compile(
    r"^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}) \[Scale (\d+)/Iter (\d+)\] (.*)")
METRIC = re.compile(r"(\w+): (-?[\d.]+(?:e-?\d+)?|nan|inf)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logbook")
    ap.add_argument("--scale", type=int, default=None,
                    help="only this scale (default: every scale present)")
    ap.add_argument("--watchdog", default=None,
                    help="watchdog/supervisor log to count restarts from")
    ap.add_argument("--steps-per-call", type=int, default=8)
    args = ap.parse_args()

    points = {}  # scale -> [(dt, iter, metrics)]
    with open(args.logbook) as f:
        for line in f:
            m = LINE.match(line.strip())
            if not m:
                continue
            ts = datetime.datetime.strptime(m.group(1), "%Y-%m-%d %H:%M:%S")
            sc, it = int(m.group(2)), int(m.group(3))
            mets = {k: float(v) for k, v in METRIC.findall(m.group(4))}
            points.setdefault(sc, []).append((ts, it, mets))

    for sc in sorted(points):
        if args.scale is not None and sc != args.scale:
            continue
        pts = points[sc]
        if len(pts) < 2:
            print(f"scale {sc}: only {len(pts)} logbook points, skipping")
            continue
        rates = []
        bad = 0
        for (t0, i0, _), (t1, i1, me) in zip(pts, pts[1:]):
            dt = (t1 - t0).total_seconds()
            if dt <= 0 or i1 <= i0:
                continue  # restart boundary
            rates.append((i1 - i0) / dt)
            if any(not math.isfinite(v) for v in me.values()):
                bad += 1
        wall = (pts[-1][0] - pts[0][0]).total_seconds()
        iters = pts[-1][1] - pts[0][1]
        q = max(1, len(rates) // 4)
        quart = [sorted(rates[i:i + q])[len(rates[i:i + q]) // 2]
                 for i in range(0, len(rates), q)][:4]
        print(f"scale {sc}: {iters} iters over {wall/60:.1f} min "
              f"({pts[0][0]} -> {pts[-1][0]})")
        print(f"  sustained {iters/wall:.3f} it/s | interval rates "
              f"min {min(rates):.3f} max {max(rates):.3f} | "
              f"quartile medians {['%.3f' % x for x in quart]}")
        print(f"  ~{iters//args.steps_per_call} chunk dispatches, "
              f"{len(pts)} logbook intervals, "
              f"{bad} intervals with non-finite metrics")
        drift = (quart[-1] - quart[0]) / quart[0] * 100 if len(quart) > 1 else 0
        print(f"  first->last quartile drift: {drift:+.1f}%")

    if args.watchdog:
        n = sum(1 for line in open(args.watchdog)
                if "watchdog: started" in line)
        print(f"watchdog starts (1 = no restart): {n}")


if __name__ == "__main__":
    main()
