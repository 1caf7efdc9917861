"""sinFID tests: Frechet math goldens + SIFID/SVFID behavior."""

import numpy as np

from hpvaegan_tpu.metrics.fid import (calculate_frechet_distance, sifid_arrays,
                                      svfid_arrays)


def test_frechet_identity_is_zero():
    rng = np.random.RandomState(0)
    mu = rng.randn(8)
    a = rng.randn(64, 8)
    sigma = np.cov(a, rowvar=False)
    d = calculate_frechet_distance(mu, sigma, mu, sigma)
    assert abs(d) < 1e-6


def test_frechet_mean_shift_golden():
    # identical covariance, mean shift d -> FID = ||d||^2
    sigma = np.eye(4)
    mu1 = np.zeros(4)
    mu2 = np.ones(4) * 2.0
    d = calculate_frechet_distance(mu1, sigma, mu2, sigma)
    np.testing.assert_allclose(d, 16.0, rtol=1e-6)


def test_sifid_zero_for_identical_and_positive_for_different():
    rng = np.random.RandomState(1)
    imgs = rng.rand(2, 32, 32, 3).astype(np.float32)
    vals = sifid_arrays(imgs, imgs.copy())
    assert max(abs(v) for v in vals) < 1e-3
    other = rng.rand(2, 32, 32, 3).astype(np.float32)
    vals2 = sifid_arrays(imgs, other)
    assert np.mean(vals2) > np.mean(vals)


def test_svfid_runs_on_videos():
    rng = np.random.RandomState(2)
    vids = rng.rand(1, 4, 16, 16, 3).astype(np.float32)
    vals = svfid_arrays(vids, vids.copy())
    assert max(abs(v) for v in vals) < 1e-3
