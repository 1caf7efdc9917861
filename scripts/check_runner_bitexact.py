#!/usr/bin/env python3
"""Verify the native PJRT runner's outputs bit-exactly against the Python
execution of the SAME exported module on the ambient JAX backend.

Usage: python scripts/check_runner_bitexact.py EXPERIMENT_DIR

Run AFTER `bash scripts/run_infer_tpu.sh EXPERIMENT_DIR` (which leaves the
runner's outputs in EXPERIMENT_DIR/infer/result/<bin-stem>_output_0.bin).
This re-executes the portable .stablehlo artifact through jax.export on the
same backend the runner's PJRT plugin targets and compares every output
byte-for-byte. Both paths compile the same StableHLO with the same XLA for
the same topology, so the expectation is max|diff| == 0.0 (verified on
hardware rounds 2-3); any nonzero diff means a d2h layout or input-plumbing
regression in the runner (see docs/PERF.md round-2 row-major fix).

Exit code 0 = bit-exact, 1 = mismatch, 2 = missing artifacts.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    infer = os.path.join(os.path.abspath(sys.argv[1]), "infer")
    result_dir = os.path.join(infer, "result")
    if not os.path.isdir(result_dir):
        print(f"no runner outputs at {result_dir} — run "
              "scripts/run_infer_tpu.sh first")
        return 2

    try:
        spec = open(os.path.join(infer, "io_spec.txt")).read().splitlines()
        z_dims = tuple(int(d) for d in spec[0].split()[1].split(","))
        amps = np.fromfile(
            os.path.join(infer, "noise_amps", "noise_amps.bin"), np.float32)
        seed = np.fromfile(os.path.join(infer, "seed", "seed.bin"),
                           np.int32)[0]
    except FileNotFoundError as e:
        # exit 1 is reserved for MISMATCH; a half-cleaned infer/ dir is 2
        print(f"missing preprocess artifact: {e.filename} — run "
              "scripts/run_infer_tpu.sh first")
        return 2

    # newest portable export, mirroring run_infer_tpu.sh's .mlir selection
    shlos = [f for f in os.listdir(infer) if f.endswith(".stablehlo")]
    if not shlos:
        print(f"no .stablehlo in {infer}")
        return 2
    shlo = max(shlos,
               key=lambda f: os.path.getmtime(os.path.join(infer, f)))

    from hpvaegan_tpu.export.stablehlo import load_serialized, run_serialized

    # deserialize ONCE outside the bin loop: each call re-compiles through
    # the remote transport otherwise (finest-scale compile is minutes)
    exported = load_serialized(os.path.join(infer, shlo))

    noise_dir = os.path.join(infer, "noise_init")
    bins = sorted(f for f in os.listdir(noise_dir) if f.endswith(".bin"))
    if not bins:
        print(f"no noise bins in {noise_dir}")
        return 2
    all_exact = True
    checked = 0
    for b in bins:
        stem = b[:-len(".bin")]
        out_path = os.path.join(result_dir, f"{stem}_output_0.bin")
        if not os.path.exists(out_path):
            print(f"runner output missing for {b}: {out_path}")
            return 2
        noise = np.fromfile(os.path.join(noise_dir, b),
                            np.float32).reshape(z_dims)
        ours = np.asarray(run_serialized(exported, noise, amps, seed),
                          np.float32).ravel()
        theirs = np.fromfile(out_path, np.float32)
        if theirs.size != ours.size:
            print(f"{b}: size mismatch runner={theirs.size} python={ours.size}")
            return 1
        # bitwise, not float compare: a NaN in the runner output must fail,
        # and max|diff| with a NaN operand is unordered
        exact = ours.tobytes() == theirs.tobytes()
        all_exact &= exact
        checked += 1
        diff = float(np.max(np.abs(ours - theirs)))  # report only
        print(f"{b}: {'bitwise equal' if exact else 'MISMATCH'}"
              f" (max|diff| = {diff})")
    print(f"checked {checked} bin(s) against {shlo}")
    if not all_exact:
        print("NOT bit-exact — suspect runner d2h layout or input plumbing")
        return 1
    print("bit-exact")
    return 0


if __name__ == "__main__":
    sys.exit(main())
