"""Single-image data pipeline: decode once, resize per scale ON DEVICE.

The reference re-reads/re-resizes the one image with cv2 on every
__getitem__ across 4 worker processes (src/datasets/image.py:36-76). Here the
image is decoded once at full resolution, the per-scale pyramid level is
produced by a device-side half-pixel bilinear resize (matching
cv2.INTER_LINEAR semantics) and cached, and batches (B replicas + per-sample
random hflip + [-1,1] normalize + the scale-0 noise_init) are formed inside a
jitted function — zero host->device traffic in the training loop.
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


def load_image01(path: str) -> np.ndarray:
    """Decode an image file to (H, W, 3) float32 in [0, 1]."""
    import imageio.v2 as imageio

    if not os.path.exists(path):
        raise FileNotFoundError(f"invalid path: {path}")
    img = np.asarray(imageio.imread(path))
    if img.ndim == 2:
        # grayscale: promote to 3 channels (the reference's cv2.imread
        # always yields BGR, so single-channel inputs trained fine there)
        img = np.stack([img] * 3, axis=-1)
    img = img[:, :, :3]
    return img.astype(np.float32) / 255.0


class SingleImageDataset:
    def __init__(self, cfg):
        img01 = load_image01(cfg.image_path)  # (H, W, 3) float in [0,1]
        self.org_size = [img01.shape[0], img01.shape[1]]
        cfg.ar = img01.shape[0] / img01.shape[1]  # H/W (reference: image.py:29)
        self.cfg = cfg
        # full-res float image in [0,1], device-resident, (1, H, W, C)
        self.image_full_scale = jnp.asarray(img01)[None]
        self._cache = {}

    def scale_size(self, scale_idx: int) -> Tuple[int, int]:
        h, w = pyramid.scale_size_2d(scale_idx, self.cfg.scale_factor,
                                     self.cfg.stop_scale, self.cfg.img_size,
                                     self.cfg.ar)
        return h, w

    def scale_image(self, scale_idx: int) -> jnp.ndarray:
        """(1, H_s, W_s, C) pyramid level in [0,1] (reference: image.py:70-76,
        cv2 INTER_LINEAR -> half-pixel, no antialias)."""
        if scale_idx not in self._cache:
            h, w = self.scale_size(scale_idx)
            self._cache[scale_idx] = jax.jit(
                functools.partial(resize_bilinear, size_hw=(h, w),
                                  align_corners=False)
            )(self.image_full_scale)
        return self._cache[scale_idx]


def make_image_batch_body(cfg, scale_idx: int):
    """Unjitted batch former (composable into scan chunks):
    (scale_img, zero_img, key) -> (real, real_zero, noise_init),
    all [-1,1] channels-last."""
    h0, w0 = pyramid.scale_size_2d(0, cfg.scale_factor, cfg.stop_scale,
                                   cfg.img_size, cfg.ar)
    batch = cfg.batch_size
    use_hflip = cfg.hflip

    def make_batch(scale_img, zero_img, key):
        k_flip, k_noise = jax.random.split(key)
        real = jnp.tile(scale_img, (batch, 1, 1, 1))
        real_zero = jnp.tile(zero_img, (batch, 1, 1, 1))
        if use_hflip:
            flips = jax.random.bernoulli(k_flip, 0.5, (batch, 1, 1, 1))
            real = jnp.where(flips, real[:, :, ::-1, :], real)
            real_zero = jnp.where(flips, real_zero[:, :, ::-1, :], real_zero)
        # Normalize([0.5],[0.5]) (reference: image.py:66)
        real = real * 2.0 - 1.0
        real_zero = real_zero * 2.0 - 1.0
        # Z_init at scale-0 size (reference: train_image.py:126-130)
        noise_init = generate_noise(k_noise, (batch, h0, w0, cfg.latent_dim))
        return real, real_zero, noise_init

    return make_batch


def make_image_batch_fn(cfg, scale_idx: int):
    """Jitted batch former (single-call use)."""
    return jax.jit(make_image_batch_body(cfg, scale_idx))
