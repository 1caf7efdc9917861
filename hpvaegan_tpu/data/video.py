"""Single-video data pipeline: decode once, per-scale resize + temporal
windowing ON DEVICE.

Reference (src/datasets/video.py:13-96): per-scale host re-decode + resize of
the whole clip, temporal subsampling per __getitem__. Here: one host decode at
full res, per-scale device resize (half-pixel bilinear per frame, cached), and
a jitted batch former that slices random temporal windows at the scale's
sampling rate, flips, normalizes, and draws the Z_init noise.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize_bilinear
from ..utils import pyramid
from ..utils.noise import generate_noise
from .frames import video_metadata, video_to_frames


class SingleVideoDataset:
    def __init__(self, cfg):
        if not os.path.exists(cfg.video_path):
            raise FileNotFoundError(f"invalid path: {cfg.video_path}")
        cfg.org_fps, h, w = video_metadata(cfg.video_path)
        self.org_frame_size = [h, w]
        cfg.ar = h / w
        cfg.fps_lcm = int(np.lcm.reduce(np.asarray(cfg.sampling_rates)))
        self.cfg = cfg
        frames = video_to_frames(cfg.video_path, cfg.start_frame, cfg.max_frames)
        if frames.shape[0] < cfg.fps_lcm + 1:
            # fail loudly NOW: the temporal-window dynamic_slice needs
            # fps_lcm+1 frames, and an undersized axis would only surface
            # as an obscure trace error minutes later, inside the first
            # chunk compile on the remote TPU
            raise ValueError(
                f"video provides {frames.shape[0]} frames from "
                f"--start-frame {cfg.start_frame} / --max-frames "
                f"{cfg.max_frames}, but the sampling rates "
                f"{cfg.sampling_rates} need lcm+1 = {cfg.fps_lcm + 1} "
                "frames per temporal window")
        # (1, T, H, W, C) float in [0,1], device-resident
        self.frames_full_scale = jnp.asarray(frames, jnp.float32)[None] / 255.0
        self.num_frames = frames.shape[0]
        self._cache = {}

    def scale_size(self, scale_idx: int) -> Tuple[int, int]:
        h, w = pyramid.scale_size_2d(scale_idx, self.cfg.scale_factor,
                                     self.cfg.stop_scale, self.cfg.img_size,
                                     self.cfg.ar)
        return h, w

    def scale_frames(self, scale_idx: int) -> jnp.ndarray:
        """(1, T_full, H_s, W_s, C) in [0,1]: all decoded frames at scale
        `scale_idx` spatial size (temporal subsampling happens per window)."""
        if scale_idx not in self._cache:
            h, w = self.scale_size(scale_idx)
            self._cache[scale_idx] = jax.jit(
                functools.partial(resize_bilinear, size_hw=(h, w),
                                  align_corners=False)
            )(self.frames_full_scale)
        return self._cache[scale_idx]


def make_video_batch_body(cfg, scale_idx: int):
    """Unjitted batch former for scale `scale_idx`:
    (scale_frames, zero_frames, key) -> (real, real_zero, noise_init).

    Windows: frames[i : i+fps_lcm+1 : every] with `every` =
    sampling_rates[fps_index] (reference: video.py:50-63); the zero-scale
    window always uses sampling_rates[0]. Z_init keeps the scale-0 time depth
    (reference: train_video.py:43-46).
    """
    _, _, fps_index = pyramid.get_fps_td_by_index(
        scale_idx, cfg.stop_scale_time, cfg.sampling_rates, cfg.org_fps,
        cfg.fps_lcm)
    every = cfg.sampling_rates[fps_index]
    every_zero = cfg.sampling_rates[0]
    h0, w0 = pyramid.scale_size_2d(0, cfg.scale_factor, cfg.stop_scale,
                                   cfg.img_size, cfg.ar)
    _, td0, _ = pyramid.get_fps_td_by_index(0, cfg.stop_scale_time,
                                            cfg.sampling_rates, cfg.org_fps,
                                            cfg.fps_lcm)
    batch = cfg.batch_size
    window = cfg.fps_lcm + 1
    use_hflip = cfg.hflip

    def make_batch(scale_frames, zero_frames, key):
        k_start, k_flip, k_noise = jax.random.split(key, 3)
        t_full = scale_frames.shape[1]
        starts = jax.random.randint(k_start, (batch,), 0,
                                    max(t_full - cfg.fps_lcm, 1))

        def take(frames, start, rate):
            win = jax.lax.dynamic_slice_in_dim(frames[0], start, window, axis=0)
            return win[::rate]

        real = jax.vmap(lambda s: take(scale_frames, s, every))(starts)
        real_zero = jax.vmap(lambda s: take(zero_frames, s, every_zero))(starts)
        if use_hflip:
            flips = jax.random.bernoulli(k_flip, 0.5, (batch, 1, 1, 1, 1))
            real = jnp.where(flips, real[:, :, :, ::-1, :], real)
            real_zero = jnp.where(flips, real_zero[:, :, :, ::-1, :], real_zero)
        real = real * 2.0 - 1.0
        real_zero = real_zero * 2.0 - 1.0
        noise_init = generate_noise(k_noise, (batch, td0, h0, w0, cfg.latent_dim))
        return real, real_zero, noise_init

    return make_batch


def make_video_batch_fn(cfg, scale_idx: int):
    """Jitted batch former (single-call use)."""
    return jax.jit(make_video_batch_body(cfg, scale_idx))
