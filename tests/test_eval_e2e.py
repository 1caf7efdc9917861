"""End-to-end eval flows: train tiny -> reload from args.txt -> batched
sampling -> artifacts -> sinFID (reference eval_image.py / eval_video.py)."""

import os

import numpy as np

from hpvaegan_tpu.config import Config
from hpvaegan_tpu.evaluation import (eval_image_experiment,
                                     eval_video_experiment, hydrate_config)
from hpvaegan_tpu.training.trainer import run_training

IMG = os.path.join(os.path.dirname(__file__), "..", "data", "imgs",
                   "air_balloons.jpg")
VID = os.path.join(os.path.dirname(__file__), "..", "data", "vids",
                   "synthetic.avi")


def test_eval_image_flow(tmp_path):
    cfg = Config(image_path=IMG, checkname="e", nfc=8, latent_dim=8,
                 num_layer=1, enc_blocks=1, niter=2, img_size=24, min_size=12,
                 max_size=24, vae_levels=1, print_interval=100,
                 run_dir=str(tmp_path), manualSeed=1).finalize()
    _, _, _, saver = run_training(cfg, mode="image", seed=1)
    exp_dir = saver.experiment_dir
    # run_training itself persists args.txt WITH derived fields (the CLI's
    # early snapshot lacks ar — that ordering bug baked ar=1.0 into eval)

    ecfg = hydrate_config(exp_dir, dict(niter=1, num_samples=3, max_samples=3,
                                        batch_size=1, data_rep=1,
                                        save_path="images", scale_idx=-1,
                                        netG=""))
    # air_balloons.jpg is 186x248 -> the persisted aspect ratio must be 0.75
    assert abs(ecfg.ar - 0.75) < 1e-9
    sifid, esaver = eval_image_experiment(ecfg, exp_dir, seed=0)
    assert np.isfinite(sifid)
    samples = np.load(os.path.join(esaver.eval_dir, "random_samples.npy"))
    assert samples.shape[0] == 3 and samples.shape[1] == 3  # (N, C, H, W)
    assert os.path.exists(os.path.join(esaver.eval_dir, "images",
                                       "fake_0.png"))

    # the score is persisted for post-hoc A/Bs (scripts/compare_runs.py),
    # not just printed like the reference's (eval_image.py:193)
    import json
    import subprocess
    import sys
    with open(os.path.join(esaver.eval_dir, "metrics.json")) as f:
        rec = json.load(f)
    assert rec["metric"] == "SIFID" and rec["value"] == sifid
    assert rec["num_samples"] == 3 and rec["on_device_fid"] is False

    # compare_runs over a real experiment layout: self-compare is exact
    repo = os.path.join(os.path.dirname(__file__), "..")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "compare_runs.py"),
         exp_dir, exp_dir, "--amp-tol", "0.001"],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stdout + out.stderr[-2000:]
    assert "max |amp deviation|: 0.00%" in out.stdout
    assert "SIFID" in out.stdout


def test_eval_video_flow(tmp_path):
    cfg = Config(video_path=VID, checkname="ev", nfc=8, latent_dim=8,
                 num_layer=1, enc_blocks=1, niter=2, img_size=18, min_size=9,
                 max_size=18, vae_levels=1, sampling_rates=[2, 1], max_frames=5,
                 discriminator="WDiscriminator3D", print_interval=100,
                 run_dir=str(tmp_path), manualSeed=1).finalize()
    _, _, _, saver = run_training(cfg, mode="video", seed=1)
    exp_dir = saver.experiment_dir

    ecfg = hydrate_config(exp_dir, dict(niter=1, num_samples=2, max_samples=2,
                                        batch_size=1, data_rep=1,
                                        save_path="images", scale_idx=-1,
                                        netG=""))
    svfid, esaver = eval_video_experiment(ecfg, exp_dir, seed=0)
    assert np.isfinite(svfid)
    samples = np.load(os.path.join(esaver.eval_dir, "random_samples.npy"))
    assert samples.ndim == 5 and samples.shape[1] == 3  # (N, C, T, H, W)
    out_dir = os.path.join(esaver.eval_dir, "images")
    assert os.path.exists(os.path.join(out_dir, "fake.gif"))
    assert os.path.exists(os.path.join(out_dir, "real_unfold.png"))


def test_eval_baseline_flow(tmp_path):
    """SinGAN baselines are evaluable too (the reference's eval path could
    not drive them at all)."""
    from hpvaegan_tpu.training.baselines_trainer import run_training as run_b

    cfg = Config(video_path=VID, checkname="eb", nfc=8, num_layer=1,
                 niter=2, img_size=18, min_size=9, max_size=18,
                 sampling_rates=[2, 1], max_frames=5,
                 generator="GeneratorCSG",
                 discriminator="WDiscriminatorBaselines", print_interval=100,
                 run_dir=str(tmp_path), manualSeed=1).finalize()
    _, _, _, saver = run_b(cfg, seed=1)
    exp_dir = saver.experiment_dir

    ecfg = hydrate_config(exp_dir, dict(niter=1, num_samples=2, max_samples=2,
                                        batch_size=1, data_rep=1,
                                        save_path="images", scale_idx=-1,
                                        netG=""))
    svfid, esaver = eval_video_experiment(ecfg, exp_dir, seed=0)
    assert np.isfinite(svfid)
    samples = np.load(os.path.join(esaver.eval_dir, "random_samples.npy"))
    assert samples.ndim == 5 and samples.shape[1] == 3


def test_eval_image_on_device_fid(tmp_path):
    """--on-device-fid --mesh-data path: sharded device-resident sampling,
    only per-sample (mu, sigma) stats leave the device (BASELINE config 5
    reachable from the eval CLI, not just bench)."""
    cfg = Config(image_path=IMG, checkname="eod", nfc=8, latent_dim=8,
                 num_layer=1, enc_blocks=1, niter=2, img_size=24, min_size=12,
                 max_size=24, vae_levels=1, print_interval=100,
                 run_dir=str(tmp_path), manualSeed=1).finalize()
    _, _, _, saver = run_training(cfg, mode="image", seed=1)
    exp_dir = saver.experiment_dir

    ecfg = hydrate_config(exp_dir, dict(niter=1, num_samples=8, max_samples=4,
                                        batch_size=1, data_rep=1,
                                        save_path="images", scale_idx=-1,
                                        mesh_data=8, on_device_fid=True,
                                        netG=""))
    sifid, esaver = eval_image_experiment(ecfg, exp_dir, seed=0)
    assert np.isfinite(sifid) and sifid >= 0
    # the fast path keeps the reference's artifact contract: the first
    # max_samples samples are written even though FID stats stay on device
    samples = np.load(os.path.join(esaver.eval_dir, "random_samples.npy"))
    assert samples.shape[0] == 4 and samples.shape[1] == 3  # (N, C, H, W)
    assert os.path.exists(os.path.join(esaver.eval_dir, "images",
                                       "fake_0.png"))


def test_eval_image_mesh_sampling(tmp_path):
    """--mesh-data WITHOUT on-device FID: artifacts still produced, sampling
    routed through the sharded sampler."""
    import os

    cfg = Config(image_path=IMG, checkname="em", nfc=8, latent_dim=8,
                 num_layer=1, enc_blocks=1, niter=2, img_size=24, min_size=12,
                 max_size=24, vae_levels=1, print_interval=100,
                 run_dir=str(tmp_path), manualSeed=1).finalize()
    _, _, _, saver = run_training(cfg, mode="image", seed=1)
    exp_dir = saver.experiment_dir

    ecfg = hydrate_config(exp_dir, dict(niter=1, num_samples=8, max_samples=4,
                                        batch_size=1, data_rep=1,
                                        save_path="images", scale_idx=-1,
                                        mesh_data=8, netG=""))
    sifid, esaver = eval_image_experiment(ecfg, exp_dir, seed=0)
    assert np.isfinite(sifid)
    samples = np.load(os.path.join(esaver.eval_dir, "random_samples.npy"))
    assert samples.shape[0] == 8


def test_eval_video_on_device_fid(tmp_path):
    """Video --on-device-fid path: device-resident video sampling + SVFID
    with eval-scale time depth, only per-sample stats leave the device."""
    cfg = Config(video_path=VID, checkname="evod", nfc=8, latent_dim=8,
                 num_layer=1, enc_blocks=1, niter=2, img_size=18, min_size=9,
                 max_size=18, vae_levels=1, sampling_rates=[2, 1],
                 stop_scale_time=-1, max_frames=5,
                 discriminator="WDiscriminator3D", print_interval=100,
                 run_dir=str(tmp_path), manualSeed=1).finalize()
    _, _, _, saver = run_training(cfg, mode="video", seed=1)
    exp_dir = saver.experiment_dir

    ecfg = hydrate_config(exp_dir, dict(niter=1, num_samples=8, max_samples=4,
                                        batch_size=1, data_rep=1,
                                        save_path="images", scale_idx=-1,
                                        mesh_data=8, on_device_fid=True,
                                        netG=""))
    svfid, esaver = eval_video_experiment(ecfg, exp_dir, seed=0)
    assert np.isfinite(svfid) and svfid >= 0
    # artifact contract in the fast path: npy + GIFs exist
    samples = np.load(os.path.join(esaver.eval_dir, "random_samples.npy"))
    assert samples.ndim == 5 and samples.shape[0] == 4  # (N, C, T, H, W)
    out_dir = os.path.join(esaver.eval_dir, "images")
    assert os.path.exists(os.path.join(out_dir, "fake.gif"))
    assert os.path.exists(os.path.join(out_dir, "real_unfold.png"))
    # the fast path persists the score too (post-hoc A/B contract)
    import json
    with open(os.path.join(esaver.eval_dir, "metrics.json")) as f:
        rec = json.load(f)
    assert rec["metric"] == "SVFID" and rec["value"] == svfid
    assert rec["on_device_fid"] is True and rec["num_samples"] == 8

def test_eval_resolves_inflight_marker_to_last_finalized(tmp_path):
    """A mid-scale (--ckpt-interval) intermediate.json names the IN-PROGRESS
    scale, whose netG_<k> does not exist yet; eval must score the last
    FINALIZED scale (mirrors preprocess.py's resolution) instead of dying
    with 'no <G> checkpoint found'."""
    import json

    import pytest

    from hpvaegan_tpu.evaluation import load_generator
    from hpvaegan_tpu.utils.saver import save_pytree

    # CSG skips the HPVAEGAN body/scale cross-check; a stub pytree suffices
    cfg = Config(video_path=VID, generator="GeneratorCSG",
                 img_size=18, min_size=9, max_size=18).finalize()
    cfg.experiment_dir = str(tmp_path)
    save_pytree({"params": {"w": np.ones(2)}, "state": {}},
                str(tmp_path / "netG_1.ckpt"))
    with open(tmp_path / "intermediate.json", "w") as f:
        json.dump({"noise_amps": [1.0, 0.1, 0.1], "scale_idx": 2,
                   "inflight": "inflight_2.ckpt", "inflight_iter": 4}, f)
    cfg.scale_idx = -1
    params, state, _ = load_generator(cfg, str(tmp_path), ndim=3)
    assert cfg.scale_idx == 1 and cfg.Noise_Amps == [1.0, 0.1]
    np.testing.assert_array_equal(params["w"], np.ones(2))

    # an explicit --scale-idx is NOT overridden by the marker
    cfg.scale_idx = 1
    load_generator(cfg, str(tmp_path), ndim=3)
    assert cfg.scale_idx == 1

    # mid-scale 0: nothing finalized to evaluate
    with open(tmp_path / "intermediate.json", "w") as f:
        json.dump({"noise_amps": [1.0], "scale_idx": 0,
                   "inflight": "inflight_0.ckpt", "inflight_iter": 4}, f)
    cfg.scale_idx = -1
    with pytest.raises(RuntimeError, match="mid-scale 0"):
        load_generator(cfg, str(tmp_path), ndim=3)
