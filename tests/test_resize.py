"""Parity tests for the matmul-based resize kernels.

align_corners semantics must match the reference exactly (SURVEY §7 'hard
parts'): wrong interpolation silently destroys pyramid consistency. Verified
against a brute-force numpy resampler and against cv2.INTER_LINEAR for the
half-pixel data-pipeline path.
"""

import numpy as np
import pytest

from hpvaegan_tpu.ops import resize as R


def _ref_resample_1d(x, n_out, align_corners):
    """Brute-force 1-D linear resample along axis 0 (fp64 reference)."""
    n_in = x.shape[0]
    out = np.zeros((n_out,) + x.shape[1:], dtype=np.float64)
    for i in range(n_out):
        if n_in == 1:
            out[i] = x[0]
            continue
        if align_corners:
            src = i * (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
        else:
            src = (i + 0.5) * n_in / n_out - 0.5
        src = min(max(src, 0.0), n_in - 1)
        lo = int(np.floor(src))
        hi = min(lo + 1, n_in - 1)
        f = src - lo
        out[i] = (1 - f) * x[lo] + f * x[hi]
    return out


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("n_in,n_out", [(5, 9), (9, 5), (1, 4), (32, 26), (26, 33)])
def test_axis_resize_matches_bruteforce(align, n_in, n_out):
    rng = np.random.RandomState(0)
    x = rng.randn(n_in, 7).astype(np.float32)
    got = np.asarray(R.resize_linear(x, (0,), (n_out,), align))
    want = _ref_resample_1d(x.astype(np.float64), n_out, align)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_bilinear_align_corners_endpoints():
    # align_corners keeps the corner pixels exactly
    rng = np.random.RandomState(1)
    x = rng.randn(1, 6, 8, 3).astype(np.float32)
    y = np.asarray(R.resize_bilinear(x, (11, 15), align_corners=True))
    np.testing.assert_allclose(y[0, 0, 0], x[0, 0, 0], rtol=1e-6)
    np.testing.assert_allclose(y[0, -1, -1], x[0, -1, -1], rtol=1e-6)
    np.testing.assert_allclose(y[0, 0, -1], x[0, 0, -1], rtol=1e-6)


def test_halfpixel_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(2)
    img = rng.rand(19, 26, 3).astype(np.float32)
    for out_hw in [(13, 17), (29, 37)]:
        want = cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_LINEAR)
        got = np.asarray(R.resize_bilinear(img[None], out_hw, align_corners=False))[0]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_trilinear_separable_consistency():
    # Trilinear on a constant-in-time video == bilinear per frame
    rng = np.random.RandomState(3)
    frame = rng.randn(1, 1, 6, 7, 2).astype(np.float32)
    vid = np.broadcast_to(frame, (1, 4, 6, 7, 2))
    out = np.asarray(R.resize_trilinear(vid, (7, 9, 11), align_corners=True))
    per_frame = np.asarray(R.resize_bilinear(frame[:, 0], (9, 11), align_corners=True))
    for t in range(7):
        np.testing.assert_allclose(out[:, t], per_frame, rtol=1e-5, atol=1e-5)


def test_trilinear_identity():
    rng = np.random.RandomState(4)
    vid = rng.randn(2, 4, 5, 6, 3).astype(np.float32)
    out = np.asarray(R.resize_trilinear(vid, (4, 5, 6)))
    np.testing.assert_allclose(out, vid)


def test_upscale_2d_target_size():
    factor = 0.7937005259840998
    x = np.zeros((1, 41, 41, 3), np.float32)
    y = R.upscale_2d(x, 2, factor, 9, 256, 1.0)
    assert y.shape == (1, 51, 51, 3)


def test_upscale_3d_target_size():
    factor = 0.7937005259840998
    x = np.zeros((1, 4, 41, 41, 3), np.float32)
    y = R.upscale_3d(x, 2, factor, 9, 256, 9, [4, 3, 2, 1], 24.0, 12, 1.0)
    assert y.shape[1:4] == (4, 51, 51)
