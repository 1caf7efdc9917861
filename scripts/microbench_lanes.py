#!/usr/bin/env python3
"""Quantify VPU lane underfill at the model's 64-channel geometry.

The finest-scale step's device time is dominated by elementwise and BN-stat
reduce fusions over (H, W, 64) activations (docs/PERF.md round-3
accounting). TPU vector lanes are 8x128; a 64-wide minor dim fills half of
them. This microbench times the two dominant op shapes at equal element
count with the channel dim at 64 vs 128 vs 512: if the wider layouts run
proportionally faster per element, the ops are lane-bound and the 64-ch
cost is a geometry tax; if times match, they are fixed-cost/bandwidth
bound and the channel width is irrelevant.

Run on the TPU: python scripts/microbench_lanes.py

Measurement notes (remote-transport rules, docs/PERF.md):
- the jitted program reduces its result to ONE scalar on device — reading
  back the full tensor would drag MBs through the tunnel and swamp the
  signal (~20x the compute);
- jitted callables are built once per shape (a fresh jax.jit closure per
  call would re-trace every time);
- REPS scan iterations amortize dispatch; the scan carry keeps every
  iteration data-dependent so XLA cannot elide them.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

H, W, C = 192, 264, 64  # the finest-scale activation geometry
REPS = 300


def make_bn_stats():
    # the select_reduce_fusion shape: per-channel mean/var over spatial dims
    def body(c, _):
        m = jnp.mean(c, axis=(0, 1))
        v = jnp.mean(jnp.square(c), axis=(0, 1)) - jnp.square(m)
        return c + (v * 1e-12).astype(c.dtype), ()

    def run(x0):
        y, _ = jax.lax.scan(body, x0, None, length=REPS)
        return jnp.sum(y.astype(jnp.float32))
    return jax.jit(run)


def make_elementwise():
    # the loop-fusion shape: scale/shift + leaky-relu chain
    def body(c, _):
        t = c * jnp.asarray(1.01, c.dtype) + jnp.asarray(0.003, c.dtype)
        y = jnp.maximum(t, jnp.asarray(0.2, c.dtype) * t)
        return y, ()

    def run(x0):
        y, _ = jax.lax.scan(body, x0, None, length=REPS)
        return jnp.sum(y.astype(jnp.float32))
    return jax.jit(run)


def timed(jfn, x):
    s = jfn(x)
    float(np.asarray(s))  # warm + completion barrier (scalar readback)
    t0 = time.perf_counter()
    s = jfn(x)
    float(np.asarray(s))
    return (time.perf_counter() - t0) / REPS * 1e6  # us per rep


def main():
    print("devices:", jax.devices())
    shapes = {
        "(192,264,64)  C=64 half-lane": (H, W, C),
        "(192,132,128) C=128 full-lane": (H, W // 2, 2 * C),
        "(192,33,512)  C=512 4x-lane": (H, W // 8, 8 * C),
    }
    bn, ew = make_bn_stats(), make_elementwise()
    for dtype in (jnp.float32, jnp.bfloat16):
        print(f"\n-- dtype {dtype.__name__}, equal element count "
              f"({H*W*C/1e6:.2f} M) --")
        for label, shp in shapes.items():
            x = jnp.ones(shp, dtype)
            t_bn = timed(bn, x)
            t_ew = timed(ew, x)
            print(f"  {label:32s} bn-stat {t_bn:7.2f} us   "
                  f"elementwise {t_ew:7.2f} us")


if __name__ == "__main__":
    main()
