"""Tests for media export and saver IO (reference: src/utils/extract.py,
saver.py)."""

import json
import os

import numpy as np

from hpvaegan_tpu.config import Config
from hpvaegan_tpu.utils.media import generate_gifs, generate_images, make_video
from hpvaegan_tpu.utils.saver import DataSaver, load_pytree, write_video


def _saver(tmp_path, **kw):
    cfg = Config(image_path="x/y/clip.jpg", checkname="m", run_dir=str(tmp_path),
                 **kw)
    return cfg, DataSaver(cfg)


def test_saver_layout_and_run_id_increment(tmp_path):
    cfg, s1 = _saver(tmp_path)
    assert s1.experiment_dir.endswith("clip/m/experiment_0")
    assert os.path.isdir(s1.eval_dir)
    cfg2, s2 = _saver(tmp_path)
    assert s2.experiment_dir.endswith("experiment_1")  # auto-increment


def test_saver_json_and_checkpoint_roundtrip(tmp_path):
    cfg, s = _saver(tmp_path)
    s.save_json({"noise_amps": [1.0, 0.5], "scale_idx": 1}, "intermediate.json")
    assert s.load_json("intermediate.json")["scale_idx"] == 1
    tree = {"params": {"w": np.arange(6.0).reshape(2, 3)}}
    s.save_checkpoint(tree, "netG_0.ckpt")
    back = s.load_checkpoint("netG_0.ckpt")
    np.testing.assert_array_equal(back["params"]["w"], tree["params"]["w"])


def test_saver_crash_ordering(tmp_path, monkeypatch):
    """The checkpoint-sequence helpers must keep the crash-consistent order:
    inflight = ckpt THEN marker; scale end = netG/netD ckpts THEN marker
    THEN inflight drop. A kill between any two writes must leave a marker
    whose referenced checkpoint exists on disk."""
    cfg, s = _saver(tmp_path)
    calls = []
    real_ckpt, real_json = DataSaver.save_checkpoint, DataSaver.save_json
    monkeypatch.setattr(DataSaver, "save_checkpoint",
                        lambda self, tree, fn: (calls.append(("ckpt", fn)),
                                                real_ckpt(self, tree, fn))[1])
    monkeypatch.setattr(DataSaver, "save_json",
                        lambda self, obj, fn: (calls.append(("json", fn)),
                                               real_json(self, obj, fn))[1])

    s.save_inflight(2, {"w": np.ones(3)}, np.zeros(2), 40, [1.0, 0.5, 0.4])
    assert calls == [("ckpt", "inflight_2.ckpt"),
                     ("json", "intermediate.json")]
    assert s.load_json("intermediate.json")["inflight_iter"] == 40

    calls.clear()
    s.finalize_scale(2, [1.0, 0.5, 0.4], {"g": np.ones(2)}, {"d": np.ones(2)})
    assert calls == [("ckpt", "netG_2.ckpt"), ("ckpt", "netD_2.ckpt"),
                     ("json", "intermediate.json")]
    assert not os.path.exists(os.path.join(s.experiment_dir,
                                           "inflight_2.ckpt"))
    assert "inflight" not in s.load_json("intermediate.json")

    calls.clear()
    s.finalize_scale(3, [1.0], {"g": np.ones(2)}, None)  # VAE phase: no netD
    assert calls == [("ckpt", "netG_3.ckpt"), ("json", "intermediate.json")]


def test_make_video_gif(tmp_path):
    frames = (np.random.RandomState(0).rand(4, 16, 16, 3) * 255).astype(np.uint8)
    path = str(tmp_path / "out.gif")
    make_video(frames, 4, path)
    assert os.path.getsize(path) > 0


def test_write_video_avi(tmp_path):
    arr = np.random.RandomState(1).rand(3, 4, 32, 32).astype(np.float32) * 2 - 1
    path = str(tmp_path / "out.avi")
    write_video(arr, path, fps=4.0)  # (C, T, H, W) contract
    assert os.path.getsize(path) > 0


def test_generate_images_and_gifs_artifacts(tmp_path):
    cfg, s = _saver(tmp_path)
    cfg.save_path = "images"
    cfg.max_samples = 2
    # random_samples.npy in the reference image layout (N, C, H, W), [-1,1]
    np.save(os.path.join(s.eval_dir, "random_samples.npy"),
            np.random.RandomState(2).rand(3, 3, 16, 16).astype(np.float32) * 2 - 1)
    generate_images(cfg, s)
    assert os.path.exists(os.path.join(s.eval_dir, "images", "fake_0.png"))

    # video artifacts: real (T,H,W,C) uint8 + samples (N,C,T,H,W)
    np.save(os.path.join(s.eval_dir, "real_full_scale.npy"),
            (np.random.RandomState(3).rand(4, 16, 16, 3) * 255).astype(np.uint8))
    np.save(os.path.join(s.eval_dir, "random_samples.npy"),
            np.random.RandomState(4).rand(2, 3, 4, 16, 16).astype(np.float32))
    generate_gifs(cfg, s)
    out = os.path.join(s.eval_dir, "images")
    for f in ("real.gif", "fake.gif", "real_unfold.png", "fake_unfold.png"):
        assert os.path.exists(os.path.join(out, f)), f


def test_run_id_numeric_after_ten_runs(tmp_path):
    """Lexicographic experiment_* sorting would pick experiment_9 as newest
    after 11 runs and silently overwrite experiment_10 (reference bug)."""
    import os

    from hpvaegan_tpu.config import Config
    from hpvaegan_tpu.utils.saver import DataSaver

    cfg = Config(image_path="a/b.jpg", checkname="n", run_dir=str(tmp_path))
    base = tmp_path / "b" / "n"
    os.makedirs(base)
    for i in range(11):  # experiment_0 .. experiment_10
        os.makedirs(base / f"experiment_{i}")
    s = DataSaver(cfg)
    assert s.experiment_dir.endswith("experiment_11")


def test_generate_images_honors_max_samples_above_20(tmp_path):
    """The reference's extra hardcoded [:20] silently capped --max-samples."""
    import os

    import numpy as np

    from hpvaegan_tpu.utils.media import generate_images

    class S:
        eval_dir = str(tmp_path)

    class C:
        max_samples = 25
        save_path = "images"

    np.save(os.path.join(str(tmp_path), "random_samples.npy"),
            np.zeros((30, 3, 8, 8), np.float32))
    generate_images(C, S)
    out = os.listdir(os.path.join(str(tmp_path), "images"))
    assert len(out) == 25
