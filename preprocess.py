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


def pre_process(cfg, exp_dir: str, seed: int = 0):
    """Write infer/{noise_init,noise_amps,seed}/*.bin
    (reference preprocess.py:25-43; bins are NCHW float32, byte-compatible)."""
    infer_dir = os.path.join(exp_dir, "infer")
    os.makedirs(infer_dir, exist_ok=True)
    with open(os.path.join(exp_dir, "intermediate.json")) as f:
        inter = json.load(f)
    if cfg.scale_idx == -1:
        cfg.scale_idx = int(inter["scale_idx"])
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
    noise_init = rng.standard_normal(shape).astype(np.float32)

    for sub in ("noise_init", "noise_amps", "seed"):
        os.makedirs(os.path.join(infer_dir, sub), exist_ok=True)
    noise_init.tofile(os.path.join(infer_dir, "noise_init", "noise_init.bin"))
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
    args = parser.parse_args()

    cfg = Config.from_args_txt(os.path.join(args.exp_dir, 'args.txt'))
    cfg.batch_size = 1
    cfg.scale_idx = args.scale_idx
    pre_process(cfg, args.exp_dir, seed=args.seed)
    print(f'wrote {os.path.join(args.exp_dir, "infer")}')


if __name__ == '__main__':
    main()
