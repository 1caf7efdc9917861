"""Golden-value tests for the pyramid scale math (reference: src/utils/images.py)."""

import math

from hpvaegan_tpu.config import Config, adjust_scales2image
from hpvaegan_tpu.utils import pyramid


def test_adjust_scales_defaults():
    # 256px, min 32, factor 0.75 -> stop_scale 9, effective factor ~0.79370
    cfg = Config().finalize()
    # reference formula (images.py:65): ceil(log_0.75(32/256)) + 1 = 9
    assert cfg.num_scales == 9
    assert cfg.stop_scale == 9  # -> 10 scales, index 0..9
    assert math.isclose(cfg.scale_factor, (32 / 256) ** (1 / 9), rel_tol=1e-12)
    assert math.isclose(cfg.scale_factor, 0.7937005259840998, rel_tol=1e-9)
    assert cfg.scale1 == 1.0


def test_get_scales_by_index_goldens():
    factor = 0.7937005259840998
    # Full default ladder. Note the reference's `+1e-6` before ceil
    # (images.py:75-77) makes scale 0 = 33px (not 32) and scale 9 = 257.
    sizes = [pyramid.get_scales_by_index(i, factor, 9, 256) for i in range(10)]
    assert sizes == [33, 41, 51, 65, 81, 102, 129, 162, 204, 257]


def test_fps_td_schedule():
    # sampling_rates [4,3,2,1], fps_lcm 12: td ladder 4,5,7,13 (SURVEY §2 images.py:87-93)
    rates = [4, 3, 2, 1]
    tds = []
    for idx in range(10):
        _, td, _ = pyramid.get_fps_td_by_index(idx, 9, rates, 24.0, 12)
        tds.append(td)
    assert tds[0] == 4 and tds[-1] == 13
    assert set(tds) == {4, 5, 7, 13}
    fps0, i0 = pyramid.get_fps_by_index(0, 9, rates, 24.0)
    assert fps0 == 6.0 and i0 == 0
    fps9, i9 = pyramid.get_fps_by_index(9, 9, rates, 24.0)
    assert fps9 == 24.0 and i9 == 3


def test_scale_sizes_with_aspect_ratio():
    factor = 0.7937005259840998
    hw = pyramid.scale_size_2d(9, factor, 9, 256, 0.5625)  # 16:9
    assert hw == [int(257 * 0.5625), 257]
    thw = pyramid.scale_size_3d(9, factor, 9, 256, 9, [4, 3, 2, 1], 24.0, 12, 1.0)
    assert thw == [13, 257, 257]


def test_args_txt_roundtrip(tmp_path):
    cfg = Config(nfc=32, niter=7, image_path="x.jpg", hflip=True).finalize()
    p = tmp_path / "args.txt"
    cfg.write_args_txt(str(p))
    cfg2 = Config.from_args_txt(str(p))
    assert cfg2.nfc == 32 and cfg2.niter == 7
    assert cfg2.image_path == "x.jpg" and cfg2.hflip is True
    assert cfg2.stop_scale == cfg.stop_scale
    assert cfg2.scale_factor == cfg.scale_factor
