"""Separable linear resize as per-axis gather+lerp (TPU-native align-corners
resize; exact f32 on the VPU, fully fusible by XLA).

The reference needs two interpolation semantics:
  * align_corners=True bilinear/trilinear inside the model
    (reference: src/utils/images.py:40-61 — ResizeBilinear(align_corners=True)
    and the custom UpsampleTrilinear3D AICPU primitive, src/tools/trilinear.py:171-254)
  * half-pixel bilinear (cv2.INTER_LINEAR, no antialias) in the data pipeline
    (reference: src/datasets/image.py:75, src/datasets/generate_frames.py:44-46)

Each linear-resampled output touches exactly 2 inputs, so the kernel is a
per-axis 2-tap gather + lerp with indices/fractions precomputed on the host at
trace time (static shapes, constant-folded). A dense interpolation-matrix
matmul (the first implementation here) maps onto the MXU but wastes ~n_in/2 x
the FLOPs and needs HIGHEST-precision passes for exactness — measured slower
end-to-end than the VPU lerp on v5e.

jax.image.resize is NOT used: its 'linear' mode is half-pixel with antialiased
downsampling, which matches neither semantics above.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import pyramid


@functools.lru_cache(maxsize=None)
def _interp_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """Dense (n_out, n_in) 1-D linear interpolation matrix, derived from
    _interp_gather so the source-index/clamp math exists in exactly one
    place (the two forms must stay bit-identical: the gather feeds the
    model/data resizes, the matrix feeds ops/pallas/upsample_noise)."""
    lo, hi, frac = _interp_gather(n_in, n_out, align_corners)
    w = np.zeros((n_out, n_in), dtype=np.float32)
    rows = np.arange(n_out)
    np.add.at(w, (rows, lo), 1.0 - frac)
    np.add.at(w, (rows, hi), frac)
    return w


@functools.lru_cache(maxsize=None)
def _interp_gather(n_in: int, n_out: int, align_corners: bool):
    """(lo_idx, hi_idx, frac) arrays for 2-tap linear interpolation."""
    lo = np.zeros((n_out,), np.int32)
    hi = np.zeros((n_out,), np.int32)
    frac = np.zeros((n_out,), np.float32)
    for i in range(n_out):
        if n_in == 1:
            continue
        if align_corners:
            src = i * (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
        else:
            src = (i + 0.5) * n_in / n_out - 0.5
        src = min(max(src, 0.0), n_in - 1)
        lo[i] = int(np.floor(src))
        hi[i] = min(lo[i] + 1, n_in - 1)
        frac[i] = src - lo[i]
    return lo, hi, frac


def _resize_axis(x: jnp.ndarray, axis: int, n_out: int,
                 align_corners: bool) -> jnp.ndarray:
    """2-tap gather + lerp along one axis.

    Each output sample touches exactly 2 inputs, so a dense interpolation
    matmul (the obvious MXU mapping) wastes ~n_in/2 x the FLOPs and — for
    exactness — needs HIGHEST-precision passes; the gather+lerp form is a
    bandwidth-bound VPU op, exact in f32, and fuses into neighbors."""
    n_in = x.shape[axis]
    if n_in == n_out:
        return x
    lo, hi, frac = _interp_gather(n_in, n_out, align_corners)
    x_lo = jnp.take(x, jnp.asarray(lo), axis=axis)
    x_hi = jnp.take(x, jnp.asarray(hi), axis=axis)
    fshape = [1] * x.ndim
    fshape[axis] = n_out
    f = jnp.asarray(frac, x.dtype).reshape(fshape)
    return x_lo + (x_hi - x_lo) * f


def resize_linear(x: jnp.ndarray, axes: Sequence[int], sizes: Sequence[int],
                  align_corners: bool = True) -> jnp.ndarray:
    """Resize `x` along `axes` to `sizes` with separable linear interpolation."""
    assert len(axes) == len(sizes)
    for axis, n_out in zip(axes, sizes):
        x = _resize_axis(x, axis, int(n_out), align_corners)
    return x


def resize_bilinear(x: jnp.ndarray, size_hw: Sequence[int],
                    align_corners: bool = True) -> jnp.ndarray:
    """Bilinear resize of (B, H, W, C) or (B, T, H, W, C) channels-last arrays.

    5-D inputs are resized per-frame (the reference folds T into batch,
    src/utils/images.py:40-51); with matmuls the fold is unnecessary.
    """
    if x.ndim == 4:
        return resize_linear(x, (1, 2), size_hw, align_corners)
    if x.ndim == 5:
        return resize_linear(x, (2, 3), size_hw, align_corners)
    raise ValueError(f"resize_bilinear expects rank 4/5, got {x.ndim}")


def resize_trilinear(x: jnp.ndarray, size_thw: Sequence[int],
                     align_corners: bool = True) -> jnp.ndarray:
    """Trilinear resize of (B, T, H, W, C).

    TPU-native equivalent of the reference's custom UpsampleTrilinear3D AICPU
    primitive (src/tools/trilinear.py:171-254) — three separable matmul passes.
    """
    if x.ndim != 5:
        raise ValueError(f"resize_trilinear expects rank 5, got {x.ndim}")
    return resize_linear(x, (1, 2, 3), size_thw, align_corners)


def upscale_2d(x: jnp.ndarray, index: int, scale_factor: float, stop_scale: int,
               img_size: int, ar: float) -> jnp.ndarray:
    """Upscale (B,H,W,C) to the size of pyramid scale `index`
    (reference: src/utils/images.py:110-117, align_corners=True)."""
    assert index > 0
    h, w = pyramid.scale_size_2d(index, scale_factor, stop_scale, img_size, ar)
    return resize_bilinear(x, (h, w), align_corners=True)


def upscale_3d(x: jnp.ndarray, index: int, scale_factor: float, stop_scale: int,
               img_size: int, stop_scale_time: int, sampling_rates: Sequence[int],
               org_fps: float, fps_lcm: int, ar: float) -> jnp.ndarray:
    """Upscale (B,T,H,W,C) to scale `index` incl. time-depth growth
    (reference: src/utils/images.py:96-107)."""
    assert index > 0
    t, h, w = pyramid.scale_size_3d(index, scale_factor, stop_scale, img_size,
                                    stop_scale_time, sampling_rates, org_fps,
                                    fps_lcm, ar)
    return resize_trilinear(x, (t, h, w), align_corners=True)
