#!/usr/bin/env python3
"""Post-process for native inference (reference: postprocess.py): turn the
PJRT runner's output .bin into PNGs and compute SIFID. Video experiments
(the reference's 310 pipeline is image-only; export.py here serves both)
produce per-sample .npy videos + GIFs and compute SVFID instead."""

import argparse
import glob
import os

import numpy as np

from hpvaegan_tpu.config import Config
from hpvaegan_tpu.metrics import calculate_SIFID, calculate_SVFID
from hpvaegan_tpu.utils import pyramid


def post_process(cfg, exp_dir: str, result_dir: str, save_path: str = 'images'):
    import imageio

    h, w = pyramid.scale_size_2d(cfg.scale_idx, cfg.scale_factor,
                                 cfg.stop_scale, cfg.img_size, cfg.ar)
    out_dir = os.path.join(exp_dir, 'infer', save_path)
    os.makedirs(out_dir, exist_ok=True)
    bins = sorted(glob.glob(os.path.join(result_dir, '*.bin')))
    assert bins, f'no runner outputs in {result_dir}'
    for i, b in enumerate(bins):
        arr = np.fromfile(b, np.float32).reshape(cfg.batch_size, cfg.nc_im,
                                                 h, w)
        img = ((arr.transpose(0, 2, 3, 1) + 1) * 127.5).clip(0, 255)
        for j, im in enumerate(img):
            imageio.imwrite(os.path.join(out_dir, f'fake_{i}_{j}.png'),
                            im.astype(np.uint8))
    return out_dir


def post_process_video(cfg, exp_dir: str, result_dir: str,
                       save_path: str = 'videos'):
    """Runner output .bin (NCTHW, [-1,1]) -> per-sample .npy videos
    ((T,H,W,C) uint8, the eval artifact contract) + fake GIFs, plus a
    real-window .npy for SVFID pairing."""
    from hpvaegan_tpu.data.video import SingleVideoDataset
    from hpvaegan_tpu.utils.media import make_video

    t, h, w = pyramid.scale_size_3d(
        cfg.scale_idx, cfg.scale_factor, cfg.stop_scale, cfg.img_size,
        cfg.stop_scale_time, cfg.sampling_rates, cfg.org_fps, cfg.fps_lcm,
        cfg.ar)
    out_dir = os.path.join(exp_dir, 'infer', save_path)
    real_dir = os.path.join(exp_dir, 'infer', 'real')
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(real_dir, exist_ok=True)
    bins = sorted(glob.glob(os.path.join(result_dir, '*.bin')))
    assert bins, f'no runner outputs in {result_dir}'
    for i, b in enumerate(bins):
        arr = np.fromfile(b, np.float32).reshape(cfg.batch_size, cfg.nc_im,
                                                 t, h, w)
        vids = (((arr.transpose(0, 2, 3, 4, 1) + 1) / 2).clip(0, 1)
                * 255).astype(np.uint8)  # (N, T, H, W, C)
        for j, v in enumerate(vids):
            np.save(os.path.join(out_dir, f'fake_{i}_{j}.npy'), v)
            make_video(v, 4, os.path.join(out_dir, f'fake_{i}_{j}.gif'))

    cfg.fps, cfg.td, cfg.fps_index = pyramid.get_fps_td_by_index(
        cfg.scale_idx, cfg.stop_scale_time, cfg.sampling_rates, cfg.org_fps,
        cfg.fps_lcm)
    frames = np.asarray(SingleVideoDataset(cfg).scale_frames(cfg.scale_idx))[0]
    # the real window the fake corresponds to: frames[0 : fps_lcm+1 : every]
    # at this scale's sampling rate (data/video.py window rule), length td
    every = cfg.sampling_rates[cfg.fps_index]
    window = frames[:cfg.fps_lcm + 1:every]
    np.save(os.path.join(real_dir, 'real_full_scale.npy'),
            (window * 255).astype(np.uint8))
    return out_dir, real_dir


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--exp-dir', type=str, required=True)
    parser.add_argument('--result-dir', type=str, default='',
                        help='runner output dir (default <exp-dir>/infer/result)')
    parser.add_argument('--device-id', default=0, type=int)
    parser.add_argument('--scale-idx', type=int, default=-1)
    parser.add_argument('--batch-size', type=int, default=1)
    args = parser.parse_args()

    cfg = Config.from_args_txt(os.path.join(args.exp_dir, 'args.txt'),
                               exceptions=['batch_size', 'scale_idx'])
    cfg.batch_size = args.batch_size
    cfg.scale_idx = args.scale_idx
    if cfg.scale_idx == -1:
        import json

        from hpvaegan_tpu.utils.saver import resolve_finalized_scale
        with open(os.path.join(args.exp_dir, 'intermediate.json')) as f:
            inter = json.load(f)
        # the runner output was exported from the last FINALIZED scale
        # (same shared rule as preprocess.pre_process / eval)
        cfg.scale_idx = resolve_finalized_scale(inter, what='post-process')

    result_dir = args.result_dir or os.path.join(args.exp_dir, 'infer',
                                                 'result')
    if getattr(cfg, 'video_path', ''):
        fake_dir, real_dir = post_process_video(cfg, args.exp_dir, result_dir)
        svfid = calculate_SVFID(real_dir, fake_dir)
        print(f'SVFID: {svfid}')
    else:
        fake_dir = post_process(cfg, args.exp_dir, result_dir)
        # score against the TRAINED image only — its parent dir may hold
        # other images that would sort first and pair with every fake
        sifid = calculate_SIFID(os.path.abspath(cfg.image_path), fake_dir)
        print(f'SIFID: {sifid}')


if __name__ == '__main__':
    main()
