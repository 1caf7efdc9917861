#!/usr/bin/env python3
"""Prepare /tmp/bench_serving so bench.py's serving row can measure LIVE on a
fresh VM (reference latency contract: ascend310_infer/src/main.cc:127-143 —
the run that reports the number is the run that measured it).

bench.serving_row() goes live only when a prepared experiment (export
sidecars + noise bins) and the built PJRT runner already exist; a fresh VM
has neither, and the trained round-4 experiment that produced the carried
benchdata/serving_latency.json record does not survive VM turnover. Serving
LATENCY, however, depends only on the compute graph — not the weight
values — so this script rebuilds the same workload shape (the stock-config
256px full-depth 2D sampler, every pyramid stage present) with INITIALIZED
params, exports it, and builds the runner:

  1. stock Config(image_path=data/imgs/air_balloons.jpg) -> the full
     9-stage ladder the trained experiment had (head + body grown by
     init_next_stage per scale, exactly the trainer's growth path);
  2. DataSaver experiment dir + args.txt (post-dataset, so derived ar
     fields are real) + finalize_scale marker -> a checkpoint layout
     byte-compatible with a trained run's;
  3. export.py --num-samples 8 (8 noise bins = the carried record's
     infer_count) + native/pjrt_runner/build.sh;
  4. symlink the experiment dir to /tmp/bench_serving (or
     $BENCH_SERVING_DIR).

Everything here runs on CPU — the TPU is only touched later by the bench
row itself (RUN_ONLY=1 scripts/run_infer_tpu.sh). Samples from the fixture
are untrained noise by construction; it exists for latency measurement
only.
"""

import os
import subprocess
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)


def main():
    import jax

    from hpvaegan_tpu import models
    from hpvaegan_tpu.config import Config
    from hpvaegan_tpu.data.image import SingleImageDataset
    from hpvaegan_tpu.training.trainer import init_next_stage
    from hpvaegan_tpu.utils.saver import DataSaver

    target = os.environ.get("BENCH_SERVING_DIR", "/tmp/bench_serving")
    if os.path.exists(os.path.join(target, "infer", "compile_options.bin")):
        print(f"{target} already prepared — nothing to do")
        return

    root = os.environ.get("FIXTURE_ROOT", "/tmp/serving_fixture")
    cfg = Config(image_path=os.path.join(REPO, "data/imgs/air_balloons.jpg"),
                 checkname="serving_fixture", run_dir=root,
                 manualSeed=1).finalize()
    SingleImageDataset(cfg)  # computes derived cfg (ar) for args.txt
    saver = DataSaver(cfg)
    cfg.saver = saver
    cfg.write_args_txt(os.path.join(saver.experiment_dir, "args.txt"))

    key = jax.random.PRNGKey(1)
    key, kg = jax.random.split(key)
    g_init = models.get_generator(cfg.generator, 2)[0]
    g_params, g_state = g_init(cfg, kg)
    for s in range(1, cfg.stop_scale + 1):
        cfg.scale_idx = s
        key, kn = jax.random.split(key)
        g_params, g_state = init_next_stage(cfg, g_params, g_state, kn, 2)
    cfg.scale_idx = cfg.stop_scale

    # plausible-magnitude amps (first scale 1.0, rest ~calibrated scale);
    # amp VALUES only scale inputs — latency-neutral
    amps = [1.0] + [0.1] * cfg.stop_scale
    saver.finalize_scale(cfg.stop_scale, amps,
                         {"params": g_params, "state": g_state})
    exp_dir = saver.experiment_dir
    print(f"fixture experiment: {exp_dir} "
          f"(stop_scale {cfg.stop_scale}, body {len(g_params['body'])})")

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run([sys.executable, os.path.join(REPO, "export.py"),
                    "--exp-dir", exp_dir, "--num-samples", "8"],
                   check=True, env=env, cwd=REPO)
    subprocess.run(["bash", os.path.join(REPO, "native/pjrt_runner/build.sh")],
                   check=True, cwd=REPO)

    if os.path.islink(target) or os.path.exists(target):
        if not os.path.islink(target):
            raise SystemExit(f"{target} exists and is not a symlink — "
                             "refusing to replace it")
        os.unlink(target)
    os.symlink(exp_dir, target)
    print(f"prepared: {target} -> {exp_dir}")


if __name__ == "__main__":
    main()
