#!/usr/bin/env python3
"""Measure the CPU-baseline step throughput for BENCH's vs_baseline.

BASELINE.md's driver target is ">=10x MindSpore-CPU step throughput".
MindSpore is not installable in this image (no pip installs), so the
recorded baseline is this framework's OWN finest-scale D+G training step on
the host CPU (JAX_PLATFORMS=cpu) — the same program bench.py times on the
TPU, same workload (256px image config, scale 9, WGAN-GP D step + G step),
same scalar-readback completion barrier. That is a measurement, not an
estimate, and it is an optimistic stand-in for MindSpore-CPU (XLA:CPU fuses
aggressively; MindSpore's CPU kernels on this graph-heavy workload are
slower per published op benches), so the derived target is conservative.

Writes benchdata/cpu_baseline.json:
  {"steps_per_sec": N, "iters": n, "seconds": s, "platform": ...,
   "methodology": "...", "measured": "YYYY-MM-DD"}

Run: python scripts/measure_cpu_baseline.py  (takes ~10-30 min on the
single-core host: one long XLA:CPU compile + a few multi-second steps)
"""

import datetime
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    import bench

    assert jax.default_backend() == "cpu", jax.devices()
    # steps_per_call=1: per-step dispatch is irrelevant on-host, and the
    # 8-step fused chunk takes minutes per call on one core
    iters = int(os.environ.get("CPU_BASELINE_ITERS", "4"))
    cfg, state, chunk, data_scale, data_zero, amps = bench.build(
        9, "float32", steps_per_call=1)
    t_c0 = time.perf_counter()
    state, m = chunk(state, data_scale, data_zero, amps)  # compile + 1 step
    float(np.asarray(m["g_loss"]))
    compile_s = time.perf_counter() - t_c0
    print(f"compile+first step: {compile_s:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = chunk(state, data_scale, data_zero, amps)
    float(np.asarray(m["g_loss"]))
    dt = time.perf_counter() - t0
    sps = iters / dt

    out = {
        "steps_per_sec": round(sps, 5),
        "iters": iters,
        "seconds": round(dt, 2),
        "platform": "XLA:CPU, single-core host (JAX_PLATFORMS=cpu)",
        "workload": ("finest-scale (9, 257px) full GAN-phase iteration: "
                     "D step (WGAN-GP double-backward) + G step "
                     "(reconstruction + adversarial), 256px image config "
                     "(nfc 64, num_layer 5, latent_dim 128)"),
        "methodology": ("same jitted program bench.py runs on TPU, "
                        "steps_per_call=1, scalar host readback barrier; "
                        "stand-in for MindSpore-CPU (not installable here), "
                        "optimistic for the baseline hence conservative for "
                        "the 10x target"),
        "measured": datetime.date.today().isoformat(),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchdata", "cpu_baseline.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
