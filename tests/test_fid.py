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


def test_load_images_grayscale(tmp_path):
    """Grayscale files must promote to 3 channels ([..., :3] on an (H, W)
    array would slice the WIDTH axis)."""
    import imageio.v2 as imageio

    from hpvaegan_tpu.metrics.fid import _load_images

    imageio.imwrite(str(tmp_path / "g.png"),
                    np.arange(64, dtype=np.uint8).reshape(8, 8))
    imgs = _load_images([tmp_path / "g.png"])
    assert imgs.shape == (1, 8, 8, 3)


def test_svfid_dark_uint8_video_scaled_by_dtype(tmp_path):
    """A near-black uint8 video (max <= 1) must still be scaled by 255 —
    dtype is authoritative, not the value range."""
    from hpvaegan_tpu.metrics.fid import calculate_SVFID

    rng = np.random.RandomState(0)
    real = (rng.rand(4, 16, 16, 3) * 255).astype(np.uint8)
    dark = np.zeros((4, 16, 16, 3), np.uint8)
    dark[0, 0, 0, 0] = 1
    rdir, fdir = tmp_path / "r", tmp_path / "f"
    rdir.mkdir(), fdir.mkdir()
    np.save(rdir / "v.npy", real)
    np.save(fdir / "v.npy", dark)
    val = calculate_SVFID(str(rdir), str(fdir))
    # the dark video now compares in [0,1] like its real pair: the distance
    # must stay at feature scale, not explode by the old ~255x mismatch
    assert np.isfinite(val)
    real01 = (real.astype(np.float32) / 255.0 * 255).astype(np.uint8)
    np.save(fdir / "v.npy", real01)
    same = calculate_SVFID(str(rdir), str(fdir))
    assert val > same  # and identical pairs score lower


def test_missing_explicit_weights_fail_loudly(tmp_path, monkeypatch):
    """An explicit (arg or env) weights path that does not exist must raise,
    not silently fall back to random features."""
    import pytest

    from hpvaegan_tpu.metrics.c3d import C3D
    from hpvaegan_tpu.metrics.inception import InceptionV3

    with pytest.raises(FileNotFoundError):
        InceptionV3([0], weights=str(tmp_path / "nope.npz"))
    with pytest.raises(FileNotFoundError):
        C3D([0], weights=str(tmp_path / "nope.npz"))
    monkeypatch.setenv("HPVAEGAN_INCEPTION_WEIGHTS", str(tmp_path / "n.npz"))
    with pytest.raises(FileNotFoundError):
        InceptionV3([0])


def test_calculate_sifid_accepts_single_real_file(tmp_path):
    """The eval/serving paths score against the ONE trained image; a sibling
    image in the same directory must not enter the real set."""
    import imageio.v2 as imageio

    from hpvaegan_tpu.metrics.fid import calculate_SIFID

    rng = np.random.RandomState(0)
    trained = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    sibling = np.zeros((16, 16, 3), np.uint8)  # would sort FIRST as a dir
    imageio.imwrite(str(tmp_path / "a_sibling.jpg"), sibling)
    imageio.imwrite(str(tmp_path / "trained.jpg"), trained)
    fdir = tmp_path / "fakes"
    fdir.mkdir()
    imageio.imwrite(str(fdir / "fake_0.png"), trained)  # identical to real
    via_file = calculate_SIFID(str(tmp_path / "trained.jpg"), str(fdir))
    via_dir = calculate_SIFID(str(tmp_path), str(fdir))
    assert via_file < via_dir  # dir pairing scored against the sibling
