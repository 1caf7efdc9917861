"""Media export: saved .npy samples -> PNGs / GIFs / unfold grids.

Behavior parity with reference src/utils/extract.py:13-83, with moviepy
replaced by imageio's GIF writer (moviepy is not a hard dependency).
Array contracts match the reference artifacts: random_samples.npy is
(N, C, H, W) for images and (N, C, T, H, W) for videos, in [-1,1];
real_full_scale.npy is (T, H, W, C) uint8.
"""

from __future__ import annotations

import os

import numpy as np


def make_video(array, fps: float, filename: str) -> None:
    """GIF from (T, H, W, C) uint8 frames (reference extract.py:13-25)."""
    import imageio.v2 as imageio

    frames = [np.asarray(f).astype(np.uint8) for f in array]
    duration = 1000.0 / fps  # imageio v3 duration in ms per frame
    imageio.mimsave(filename, frames, duration=duration, loop=0)


def generate_images(cfg, saver) -> None:
    """random_samples.npy -> fake_<i>.png (reference extract.py:28-41)."""
    import imageio.v2 as imageio

    fakes_path = os.path.join(saver.eval_dir, "random_samples.npy")
    out_dir = os.path.join(saver.eval_dir, cfg.save_path)
    os.makedirs(out_dir, exist_ok=True)

    samples = np.load(fakes_path)  # (N, C, H, W) in [-1, 1]
    # ONE cap: --max-samples (the reference's extra hardcoded [:20],
    # extract.py:37, silently ignored the flag above 20)
    samples = samples.transpose(0, 2, 3, 1)[:cfg.max_samples]
    samples = (samples + 1) / 2
    samples = (samples * 255).astype(np.uint8)
    for i, sample in enumerate(samples):
        imageio.imwrite(os.path.join(out_dir, f"fake_{i}.png"), sample)


def generate_gifs(cfg, saver) -> None:
    """real.gif / fake.gif + unfold grids (reference extract.py:44-83)."""
    import cv2
    import imageio.v2 as imageio

    reals_path = os.path.join(saver.eval_dir, "real_full_scale.npy")
    fakes_path = os.path.join(saver.eval_dir, "random_samples.npy")
    out_dir = os.path.join(saver.eval_dir, cfg.save_path)
    os.makedirs(out_dir, exist_ok=True)

    real_sample = np.load(reals_path)  # (T, H, W, C) uint8
    make_video(real_sample, 4, os.path.join(out_dir, "real.gif"))
    imageio.imwrite(os.path.join(out_dir, "real_unfold.png"),
                    cv2.hconcat(list(real_sample)))

    # (N, C, T, H, W) [-1,1] -> (N, T, H, W, C) [0,1]
    samples = np.load(fakes_path).transpose(0, 2, 3, 4, 1)[:cfg.max_samples]
    samples = (samples + 1) / 2

    fake_u8 = (samples * 255).astype(np.uint8)
    sub = fake_u8[:, ::2]  # every other frame for the unfold grid
    rows = [cv2.hconcat(list(vid)) for vid in sub[:10]]
    imageio.imwrite(os.path.join(out_dir, "fake_unfold.png"),
                    cv2.vconcat(rows))

    # side-by-side gif with white spacers (extract.py:70-83)
    t = fake_u8.shape[1]
    spacer = np.full((t,) + fake_u8.shape[2:3] + (10, 3), 255, np.uint8)
    strips = []
    for i, vid in enumerate(fake_u8):
        strips.append(vid)
        if i < len(fake_u8) - 1:
            strips.append(spacer)
    concat = np.concatenate(strips, axis=2)
    make_video(concat, 4, os.path.join(out_dir, "fake.gif"))
