#!/usr/bin/env python3
"""Capture a jax.profiler trace of the finest-scale training chunk for the
device-time accounting in docs/PERF.md (analyze with
scripts/analyze_xplane.py PROFILE_DIR).

Usage: python scripts/profile_finest_chunk.py OUT_DIR [--compute-dtype D]
       [--fused-dg|--no-fused-dg] [--chunks N]

Warmup (compile + 2 chunks) happens OUTSIDE the trace so the trace holds
only steady-state execution of N chunks (N * steps_per_call full D+G
iterations), completion forced by a scalar host readback (the remote-TPU
barrier rule, docs/PERF.md "Measurement integrity").
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--fused-dg", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--scale-idx", type=int, default=9)
    ap.add_argument("--video", action="store_true",
                    help="profile the 3D video chunk instead (128px/13-frame "
                         "workload; pass --scale-idx 6 for its finest scale)")
    args = ap.parse_args()

    import jax
    import numpy as np

    from bench import build, build_video

    if args.video:
        cfg, state, chunk, data_scale, data_zero, amps = build_video(
            args.scale_idx, args.compute_dtype, fused_dg=args.fused_dg)
    else:
        cfg, state, chunk, data_scale, data_zero, amps = build(
            args.scale_idx, args.compute_dtype, fused_dg=args.fused_dg)
    for _ in range(2):
        state, m = chunk(state, data_scale, data_zero, amps)
    float(np.asarray(m["g_loss"]))

    with jax.profiler.trace(args.out_dir):
        for _ in range(args.chunks):
            state, m = chunk(state, data_scale, data_zero, amps)
        float(np.asarray(m["g_loss"]))
    print(f"trace written to {args.out_dir} "
          f"({args.chunks} chunks x {cfg.steps_per_call} steps, "
          f"{args.compute_dtype}, fused_dg={args.fused_dg})")


if __name__ == "__main__":
    main()
