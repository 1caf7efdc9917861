"""sinFID: single-image (SIFID) and single-video (SVFID) Frechet distances.

Re-design of reference src/sinFID/fid_score.py:36-242: per-(real,fake)-pair
Frechet distance over PER-SPATIAL-POSITION deep features (block-0 features
reshaped (B*H*W, C), fid_score.py:96-97). Feature extraction is batched and
jitted on device; the Frechet math (scipy sqrtm with eps jitter,
fid_score.py:105-159) stays host-side — the covariances are only CxC (64x64
by default).

The reference SVFID path is non-functional as shipped (C3D loads InceptionV3,
c3d.py:59-60); here SVFID works on video arrays: (T, H, W, C) pairs through
C3D block features.
"""

from __future__ import annotations

import pathlib
import warnings
from typing import List, Optional

import numpy as np
from scipy import linalg

from .c3d import C3D
from .inception import InceptionV3


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6):
    """Frechet distance between two Gaussians (reference fid_score.py:105-159,
    itself the standard Dougal J. Sutherland numpy implementation)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    assert mu1.shape == mu2.shape
    assert sigma1.shape == sigma2.shape

    diff = mu1 - mu2
    # (near-)singular products are EXPECTED here (per-position stats can
    # have fewer positions than channels) and explicitly handled by the
    # eps-offset retry below, so scipy's advisory warning is noise at this
    # call site; `disp` is not passed (deprecated, removed in scipy 1.18).
    with warnings.catch_warnings():
        warnings.filterwarnings("ignore", message="Matrix is singular")
        covmean = np.asarray(linalg.sqrtm(sigma1.dot(sigma2)))
        if not np.isfinite(covmean).all():
            offset = np.eye(sigma1.shape[0]) * eps
            covmean = np.asarray(
                linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset)))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError("Imaginary component {}".format(
                np.max(np.abs(covmean.imag))))
        covmean = covmean.real
    return (diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
            - 2 * np.trace(covmean))


def _positionwise_stats(feats: np.ndarray):
    """(…, C) features -> (mu, sigma) over all positions (fid_score.py:96-97,
    162-180)."""
    act = np.asarray(feats, np.float64).reshape(-1, feats.shape[-1])
    mu = np.mean(act, axis=0)
    sigma = np.cov(act, rowvar=False)
    return mu, sigma


def _block_out(model, outs, dims: int):
    """Select the `dims` block from a model's output list — a
    caller-supplied model may have been built with MORE output blocks, so
    [-1] would silently return the wrong features."""
    idx = model.output_blocks.index(model.BLOCK_INDEX_BY_DIM[dims])
    return outs[idx]


def sifid_arrays(reals: np.ndarray, fakes: np.ndarray,
                 dims: int = 64, model: Optional[InceptionV3] = None,
                 weights: Optional[str] = None) -> List[float]:
    """Per-pair SIFID. reals/fakes: (N, H, W, 3) float in [0,1]; fake i pairs
    with real min(i, N_real-1) (fid_score.py:198-203)."""
    model = model or InceptionV3([InceptionV3.BLOCK_INDEX_BY_DIM[dims]],
                                 weights=weights)
    vals = []
    for i in range(len(fakes)):
        real = reals[min(i, len(reals) - 1)]
        f_real = np.asarray(_block_out(model, model(real[None]), dims))
        f_fake = np.asarray(_block_out(model, model(fakes[i][None]), dims))
        m1, s1 = _positionwise_stats(f_real)
        m2, s2 = _positionwise_stats(f_fake)
        vals.append(float(calculate_frechet_distance(m2, s2, m1, s1)))
    return vals


def svfid_arrays(reals: np.ndarray, fakes: np.ndarray,
                 dims: int = 64, model: Optional[C3D] = None,
                 weights: Optional[str] = None) -> List[float]:
    """Per-pair SVFID. reals/fakes: (N, T, H, W, 3) float in [0,1]."""
    model = model or C3D([C3D.BLOCK_INDEX_BY_DIM[dims]], weights=weights)
    vals = []
    for i in range(len(fakes)):
        real = reals[min(i, len(reals) - 1)]
        f_real = np.asarray(_block_out(model, model(real[None]), dims))
        f_fake = np.asarray(_block_out(model, model(fakes[i][None]), dims))
        m1, s1 = _positionwise_stats(f_real)
        m2, s2 = _positionwise_stats(f_fake)
        vals.append(float(calculate_frechet_distance(m2, s2, m1, s1)))
    return vals


def _load_images(files) -> np.ndarray:
    import imageio.v2 as imageio

    imgs = []
    for f in files:
        img = np.asarray(imageio.imread(str(f))).astype(np.float32)
        if img.ndim == 2:
            # grayscale: [..., :3] on an (H, W) array would slice WIDTH
            img = np.stack([img] * 3, axis=-1)
        img = img[..., :3]
        imgs.append(img / 255.0)
    return np.stack(imgs)


def calculate_SIFID(real_dir: str, fake_dir: str, batch_size: int = 1,
                    dims: int = 64, suffix: str = "png",
                    weights: Optional[str] = None) -> float:
    """Directory-level SIFID (reference fid_score.py:183-211: reals glob
    *.jpg, fakes glob *.<suffix>). real_dir may also be a single image FILE
    — the eval/serving paths score against the one trained image, not
    whatever else shares its directory."""
    real_path = pathlib.Path(real_dir)
    if real_path.is_file():
        real_files = [real_path]
    else:
        real_files = sorted(real_path.glob("*.jpg")) or \
            sorted(real_path.glob("*.png"))
    fake_files = sorted(pathlib.Path(fake_dir).glob(f"*.{suffix}"))
    assert real_files and fake_files, (real_dir, fake_dir)
    # ONE model for the whole directory: a fresh InceptionV3 per pair costs
    # a full retrace+compile (~17 s through the remote-TPU tunnel) per file
    model = InceptionV3([InceptionV3.BLOCK_INDEX_BY_DIM[dims]],
                        weights=weights)
    vals = []
    for i, fake in enumerate(fake_files):
        real = real_files[min(i, len(real_files) - 1)]
        reals = _load_images([real])
        fakes = _load_images([fake])
        if reals.shape != fakes.shape:
            # per-pair metric needs same grid; crop both to the TOP-LEFT
            # overlap (matches how the pyramid anchors content)
            h = min(reals.shape[1], fakes.shape[1])
            w = min(reals.shape[2], fakes.shape[2])
            reals, fakes = reals[:, :h, :w], fakes[:, :h, :w]
        vals.extend(sifid_arrays(reals, fakes, dims, model=model))
    return float(np.asarray(vals, np.float32).mean())


def calculate_SVFID(real_dir: str, fake_dir: str, batch_size: int = 1,
                    dims: int = 64, suffix: str = "npy",
                    weights: Optional[str] = None) -> float:
    """Directory-level SVFID over .npy video arrays (T,H,W,C) in [0,1] or
    [0,255]. (The reference's image-file SVFID path was broken; .npy videos
    are what eval_video.py actually produces.)"""
    real_files = sorted(pathlib.Path(real_dir).glob(f"*.{suffix}"))
    fake_files = sorted(pathlib.Path(fake_dir).glob(f"*.{suffix}"))
    assert real_files and fake_files, (real_dir, fake_dir)

    def load(f):
        raw = np.load(str(f))
        arr = raw.astype(np.float32)
        # dtype is authoritative: a NEAR-BLACK uint8 video (max <= 1) must
        # still be scaled, or it gets compared ~255x off its real pair.
        # The float heuristic stays for float arrays saved in [0,255].
        if raw.dtype == np.uint8 or arr.max() > 1.5:
            arr = arr / 255.0
        return arr

    model = C3D([C3D.BLOCK_INDEX_BY_DIM[dims]], weights=weights)
    vals = []
    for i, fake in enumerate(fake_files):
        real = real_files[min(i, len(real_files) - 1)]
        r, f = load(real), load(fake)
        t = min(r.shape[0], f.shape[0])
        h = min(r.shape[1], f.shape[1])
        w = min(r.shape[2], f.shape[2])
        vals.extend(svfid_arrays(r[None, :t, :h, :w], f[None, :t, :h, :w],
                                 dims, model=model))
    return float(np.asarray(vals, np.float32).mean())
