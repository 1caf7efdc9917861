#!/usr/bin/env python3
"""A/B two experiment directories: amp trajectories, rates, eval scores.

Usage: python scripts/compare_runs.py EXP_A EXP_B [--amp-tol PCT]

This is the round-3 lever-qualification methodology (docs/PERF.md: the
bf16 + --fused-dg A/B vs the f32 default, judged against a seed-to-seed
noise floor) as a one-command tool. For each experiment it reads:

  * intermediate.json  — per-scale noise_amps (the training-math summary:
    a lever that changes optimization shows up here first);
  * logbook.txt        — the per-scale `scale K done in Ss (R it/s)`
    close lines (the de-facto throughput metric, utils/progress.py);
  * eval/metrics.json  — the persisted SIFID/SVFID, written by the eval
    CLIs (hpvaegan_tpu/evaluation.py).

and prints a side-by-side table with per-scale deltas. With --amp-tol P
the exit code becomes 1 when any scale's amp deviates by more than P
percent (a CI-style gate; pick P from a measured seed-to-seed floor —
round 3 measured up to 9.6% between seeds on the reference workload).

Exit code: 0 = compared (within tolerance if given), 1 = tolerance
exceeded, 2 = missing artifacts.
"""

import argparse
import json
import os
import re
import sys

# the "(R it/s)" suffix is the main trainer's (trainer.py close line); the
# baselines trainer logs only "scale K done in Ss" — rate group optional
CLOSE = re.compile(r"scale (\d+) done in ([\d.]+)s(?: \(([\d.]+) it/s\))?")


def load_amps(exp):
    path = os.path.join(exp, "intermediate.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f).get("noise_amps")


def load_rates(exp):
    """scale -> (seconds, it/s); the LAST close line per scale wins (a
    retried scale logs one line per attempt)."""
    path = os.path.join(exp, "logbook.txt")
    rates = {}
    if not os.path.exists(path):
        return rates
    with open(path) as f:
        for line in f:
            m = CLOSE.search(line)
            if m:
                rate = float(m.group(3)) if m.group(3) else None
                rates[int(m.group(1))] = (float(m.group(2)), rate)
    return rates


def load_eval(exp):
    path = os.path.join(exp, "eval", "metrics.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def pct(a, b):
    """Percent deviation of b from a (None when a == 0)."""
    return None if a == 0 else 100.0 * (b - a) / abs(a)


def fmt_pct(p):
    return "    n/a" if p is None else f"{p:+7.2f}%"


def main():
    ap = argparse.ArgumentParser(
        description="A/B two experiment dirs (amps, rates, eval scores)")
    ap.add_argument("exp_a")
    ap.add_argument("exp_b")
    ap.add_argument("--amp-tol", type=float, default=None, metavar="PCT",
                    help="exit 1 if any scale's amp deviates more than PCT "
                    "percent (gate; calibrate against a seed-to-seed floor)")
    args = ap.parse_args()

    a, b = os.path.abspath(args.exp_a), os.path.abspath(args.exp_b)
    print(f"A: {a}\nB: {b}\n")

    amps_a, amps_b = load_amps(a), load_amps(b)
    if amps_a is None or amps_b is None:
        print("missing intermediate.json in "
              + ("both" if amps_a is None and amps_b is None
                 else ("A" if amps_a is None else "B")))
        return 2

    worst = 0.0
    structural = None  # non-numeric reason the gate must fail
    print("noise_amps (training-math trajectory)")
    print("scale |          A |          B |    B vs A")
    n = max(len(amps_a), len(amps_b))
    for k in range(n):
        if k >= len(amps_a) or k >= len(amps_b):
            print(f"{k:5d} | {'--' if k >= len(amps_a) else amps_a[k]:>10} "
                  f"| {'--' if k >= len(amps_b) else amps_b[k]:>10} |"
                  " (scale count differs)")
            structural = (f"scale counts differ: A has {len(amps_a)}, "
                          f"B has {len(amps_b)}")
            continue
        p = pct(amps_a[k], amps_b[k])
        if p is not None:
            worst = max(worst, abs(p))
        elif amps_b[k] != 0:
            # A amp exactly 0, B nonzero: not expressible as a percentage
            # but certainly not "within tolerance"
            structural = f"scale {k}: A amp is 0 but B is {amps_b[k]}"
        print(f"{k:5d} | {amps_a[k]:10.6f} | {amps_b[k]:10.6f} | {fmt_pct(p)}")
    print(f"max |amp deviation|: {worst:.2f}%"
          + ("" if args.amp_tol is None else f" (tolerance {args.amp_tol}%)"))

    rates_a, rates_b = load_rates(a), load_rates(b)
    common = sorted(set(rates_a) & set(rates_b))
    if common:
        print("\nper-scale throughput (logbook close lines)")
        print("scale |   A it/s |   B it/s |   speedup")
        tot_a = tot_b = 0.0
        for k in common:
            sa, ra = rates_a[k]
            sb, rb = rates_b[k]
            tot_a += sa
            tot_b += sb
            # no it/s in the close line (baselines trainer): equal iteration
            # counts per scale make the seconds ratio the speedup
            fa = f"{ra:8.2f}" if ra is not None else f"{sa:7.1f}s"
            fb = f"{rb:8.2f}" if rb is not None else f"{sb:7.1f}s"
            speed = rb / ra if ra and rb else (sa / sb if sb else float("nan"))
            print(f"{k:5d} | {fa} | {fb} | {speed:8.2f}x")
        print(f"wall over common scales: A {tot_a:.1f}s, B {tot_b:.1f}s "
              f"({tot_a / tot_b:.2f}x)" if tot_b else "")
    else:
        print("\nno common per-scale close lines in the logbooks")

    ev_a, ev_b = load_eval(a), load_eval(b)
    if ev_a and ev_b:
        print(f"\neval: A {ev_a['metric']}={ev_a['value']:.6f} "
              f"({ev_a['num_samples']} samples), "
              f"B {ev_b['metric']}={ev_b['value']:.6f} "
              f"({ev_b['num_samples']} samples)"
              f" | B vs A {fmt_pct(pct(ev_a['value'], ev_b['value'])).strip()}")
    else:
        print("\neval/metrics.json present in: "
              + ("neither" if not ev_a and not ev_b
                 else ("A only" if ev_a else "B only"))
              + " — run eval_image.py/eval_video.py to produce it")

    if args.amp_tol is not None:
        if structural is not None:
            print(f"\nAMP GATE FAILED (structural): {structural}")
            return 1
        if worst > args.amp_tol:
            print(f"\nAMP TOLERANCE EXCEEDED: {worst:.2f}% > {args.amp_tol}%")
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
