#!/usr/bin/env python3
"""Pre-process for native inference (reference: preprocess.py): writes the
noise_init / noise_amps / seed .bin inputs for the PJRT runner into
<exp-dir>/infer/."""

import argparse
import json
import os

import numpy as np

from hpvaegan_tpu.config import Config
from hpvaegan_tpu.utils import pyramid
from hpvaegan_tpu.utils.saver import resolve_finalized_scale


def pre_process(cfg, exp_dir: str, seed: int = 0, num_samples: int = 1):
    """Write infer/{noise_init,noise_amps,seed}/*.bin
    (reference preprocess.py:25-43; bins are NCHW float32, byte-compatible).

    num_samples > 1 writes one noise bin per sample — the runner executes
    once per input0 file and averages latency over them (reference
    main.cc:106-143 loop), and postprocess turns each into artifacts."""
    infer_dir = os.path.join(exp_dir, "infer")
    os.makedirs(infer_dir, exist_ok=True)
    with open(os.path.join(exp_dir, "intermediate.json")) as f:
        inter = json.load(f)
    if cfg.scale_idx == -1:
        # an inflight (--ckpt-interval) marker resolves to the last
        # FINALIZED scale — shared contract with eval/postprocess
        cfg.scale_idx = resolve_finalized_scale(inter, what="serve")
    amps = np.zeros((cfg.stop_scale + 2,), np.float32)
    vals = inter["noise_amps"][:cfg.scale_idx + 1]
    amps[:len(vals)] = vals

    h0, w0 = pyramid.scale_size_2d(0, cfg.scale_factor, cfg.stop_scale,
                                   cfg.img_size, cfg.ar)
    rng = np.random.RandomState(seed)
    if getattr(cfg, "video_path", ""):
        # video: NCTHW noise at scale-0 time depth (train_video.py:43-46)
        _, td0, _ = pyramid.get_fps_td_by_index(
            0, cfg.stop_scale_time, cfg.sampling_rates, cfg.org_fps,
            cfg.fps_lcm)
        shape = (cfg.batch_size, cfg.latent_dim, td0, h0, w0)
    else:
        shape = (cfg.batch_size, cfg.latent_dim, h0, w0)
    for sub in ("noise_init", "noise_amps", "seed"):
        os.makedirs(os.path.join(infer_dir, sub), exist_ok=True)
    # stale bins from a previous sample count would feed the runner extra
    # inputs (it executes every file in the dir) and leak old outputs into
    # postprocess
    for sub in ("noise_init", "result"):
        d = os.path.join(infer_dir, sub)
        if os.path.isdir(d):
            for old in os.listdir(d):
                if old.endswith(".bin"):
                    os.remove(os.path.join(d, old))
    noise_init = None
    for i in range(max(1, num_samples)):
        draw = rng.standard_normal(shape).astype(np.float32)
        noise_init = draw if noise_init is None else noise_init
        name = "noise_init.bin" if num_samples <= 1 \
            else f"noise_init_{i:03d}.bin"
        draw.tofile(os.path.join(infer_dir, "noise_init", name))
    amps.tofile(os.path.join(infer_dir, "noise_amps", "noise_amps.bin"))
    np.asarray(seed, np.int32).tofile(os.path.join(infer_dir, "seed",
                                                   "seed.bin"))
    return noise_init, amps


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--exp-dir', type=str, required=True,
                        help='Experiment directory')
    parser.add_argument('--device-id', default=0, type=int, help='Device ID')
    parser.add_argument('--scale-idx', type=int, default=-1,
                        help='current scale idx (=len of body)')
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--num-samples', type=int, default=1,
                        help='noise bins to write (runner executes one '
                        'inference per bin and averages latency)')
    parser.add_argument('--batch-size', type=int, default=1,
                        help='must match the export\'s --batch-size (the '
                        'runner validates bin bytes against io_spec.txt)')
    args = parser.parse_args()

    cfg = Config.from_args_txt(os.path.join(args.exp_dir, 'args.txt'))
    cfg.batch_size = args.batch_size
    cfg.scale_idx = args.scale_idx
    pre_process(cfg, args.exp_dir, seed=args.seed,
                num_samples=args.num_samples)
    print(f'wrote {os.path.join(args.exp_dir, "infer")}')


if __name__ == '__main__':
    main()
