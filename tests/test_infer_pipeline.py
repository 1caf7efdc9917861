"""Native-serving pipeline e2e (Python side of scripts/run_infer_tpu.sh):
train tiny -> preprocess bins -> StableHLO export -> execute serialized
module -> postprocess PNGs + SIFID. (The C++ PJRT runner itself is exercised
on hardware; its outputs were verified bit-exact vs this path.)"""

import os
import subprocess
import sys

import numpy as np

from hpvaegan_tpu.config import Config
from hpvaegan_tpu.training.trainer import run_training

IMG = os.path.join(os.path.dirname(__file__), "..", "data", "imgs",
                   "air_balloons.jpg")
VID = os.path.join(os.path.dirname(__file__), "..", "data", "vids",
                   "synthetic.avi")
REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _run_exported_module(infer: str) -> None:
    """Execute the serialized StableHLO on the preprocess bins and write the
    runner-format output .bin (what the C++ PJRT runner does on hardware)."""
    from hpvaegan_tpu.export.stablehlo import load_and_run_serialized
    spec = open(os.path.join(infer, "io_spec.txt")).read().splitlines()
    z_dims = tuple(int(d) for d in spec[0].split()[1].split(","))
    noise = np.fromfile(os.path.join(infer, "noise_init/noise_init.bin"),
                        np.float32).reshape(z_dims)
    amps = np.fromfile(os.path.join(infer, "noise_amps/noise_amps.bin"),
                       np.float32)
    seed = np.fromfile(os.path.join(infer, "seed/seed.bin"), np.int32)[0]
    sh = [f for f in os.listdir(infer) if f.endswith(".stablehlo")][0]
    result = load_and_run_serialized(os.path.join(infer, sh), noise, amps,
                                     seed)
    result_dir = os.path.join(infer, "result")
    os.makedirs(result_dir, exist_ok=True)
    np.asarray(result).tofile(os.path.join(result_dir, "output_0.bin"))


def test_infer_pipeline(tmp_path):
    cfg = Config(image_path=IMG, checkname="inf", nfc=8, latent_dim=8,
                 num_layer=1, enc_blocks=1, niter=2, img_size=24, min_size=12,
                 max_size=24, vae_levels=1, print_interval=100,
                 run_dir=str(tmp_path), manualSeed=1).finalize()
    _, _, _, saver = run_training(cfg, mode="image", seed=1)
    exp_dir = saver.experiment_dir

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # export (runs preprocess internally, writes bins + sidecars)
    out = subprocess.run([sys.executable, os.path.join(REPO, "export.py"),
                          "--exp-dir", exp_dir], capture_output=True,
                         text=True, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    infer = os.path.join(exp_dir, "infer")
    for sub in ("noise_init/noise_init.bin", "noise_amps/noise_amps.bin",
                "seed/seed.bin", "compile_options.bin", "io_spec.txt"):
        assert os.path.exists(os.path.join(infer, sub)), sub
    mlirs = [f for f in os.listdir(infer) if f.endswith(".mlir")]
    assert mlirs

    # execute the serialized module on the bins (what the C++ runner does)
    _run_exported_module(infer)

    # postprocess -> PNGs + SIFID
    out = subprocess.run([sys.executable, os.path.join(REPO, "postprocess.py"),
                          "--exp-dir", exp_dir], capture_output=True,
                         text=True, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "SIFID:" in out.stdout
    assert os.path.exists(os.path.join(infer, "images", "fake_0_0.png"))

    # scripts/check_runner_bitexact.py (the closeout tool that compares the
    # hardware runner's outputs against this Python path): with a runner-named
    # copy of the output it reports bit-exact; with a corrupted byte it fails.
    import shutil
    runner_out = os.path.join(infer, "result", "noise_init_output_0.bin")
    shutil.copy(os.path.join(infer, "result", "output_0.bin"), runner_out)
    check = [sys.executable,
             os.path.join(REPO, "scripts", "check_runner_bitexact.py"),
             exp_dir]
    out = subprocess.run(check, capture_output=True, text=True, env=env,
                         cwd=REPO)
    assert out.returncode == 0, out.stdout + out.stderr[-2000:]
    assert "bit-exact" in out.stdout
    with open(runner_out, "r+b") as f:
        f.seek(0)
        f.write(b"\xff\xff\xff\xff")
    out = subprocess.run(check, capture_output=True, text=True, env=env,
                         cwd=REPO)
    assert out.returncode == 1, out.stdout + out.stderr[-2000:]
    assert "NOT bit-exact" in out.stdout

    # a half-cleaned infer dir (result/ left, io_spec.txt gone) is "missing
    # artifacts" (exit 2), never "mismatch" (exit 1 is the regression signal)
    os.rename(os.path.join(infer, "io_spec.txt"),
              os.path.join(infer, "io_spec.txt.bak"))
    out = subprocess.run(check, capture_output=True, text=True, env=env,
                         cwd=REPO)
    assert out.returncode == 2, out.stdout + out.stderr[-2000:]
    assert "missing preprocess artifact" in out.stdout
    os.rename(os.path.join(infer, "io_spec.txt.bak"),
              os.path.join(infer, "io_spec.txt"))


def test_preprocess_multi_sample_bins(tmp_path):
    """--num-samples N writes N distinct noise bins and clears stale
    noise/result bins (the runner executes EVERY file in the input dir, so
    leftovers would feed it extra inputs and leak old outputs into
    postprocess)."""
    from preprocess import pre_process

    cfg = Config(image_path=IMG, checkname="pp", nfc=8, latent_dim=8,
                 num_layer=1, enc_blocks=1, niter=2, img_size=24, min_size=12,
                 max_size=24, vae_levels=1, print_interval=100,
                 run_dir=str(tmp_path), manualSeed=1).finalize()
    _, _, _, saver = run_training(cfg, mode="image", seed=1)
    exp_dir = saver.experiment_dir

    cfg.scale_idx = -1
    pre_process(cfg, exp_dir, num_samples=3)
    noise_dir = os.path.join(exp_dir, "infer", "noise_init")
    bins = sorted(os.listdir(noise_dir))
    assert bins == [f"noise_init_{i:03d}.bin" for i in range(3)]
    arrs = [np.fromfile(os.path.join(noise_dir, b), np.float32) for b in bins]
    assert not np.allclose(arrs[0], arrs[1])  # distinct draws

    # stale result bins are cleared; sample count changes don't leave strays
    result_dir = os.path.join(exp_dir, "infer", "result")
    os.makedirs(result_dir, exist_ok=True)
    open(os.path.join(result_dir, "stale_output_0.bin"), "wb").write(b"x")
    cfg.scale_idx = -1
    pre_process(cfg, exp_dir, num_samples=1)
    assert sorted(os.listdir(noise_dir)) == ["noise_init.bin"]
    assert os.listdir(result_dir) == []


def test_infer_pipeline_video(tmp_path):
    """Video serving chain: 3D export (NCTHW bins) -> execute -> postprocess
    .npy videos + GIF + SVFID (the reference's 310 pipeline is image-only;
    its eval_video resume path is stubbed — eval_video.py:170)."""
    cfg = Config(video_path=VID, checkname="infv", nfc=8, latent_dim=8,
                 num_layer=1, enc_blocks=1, niter=2, img_size=18, min_size=9,
                 max_size=18, vae_levels=1, sampling_rates=[2, 1], max_frames=5,
                 discriminator="WDiscriminator3D", print_interval=100,
                 run_dir=str(tmp_path), manualSeed=1).finalize()
    _, _, _, saver = run_training(cfg, mode="video", seed=1)
    exp_dir = saver.experiment_dir

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, os.path.join(REPO, "export.py"),
                          "--exp-dir", exp_dir], capture_output=True,
                         text=True, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    infer = os.path.join(exp_dir, "infer")

    _run_exported_module(infer)

    out = subprocess.run([sys.executable, os.path.join(REPO, "postprocess.py"),
                          "--exp-dir", exp_dir], capture_output=True,
                         text=True, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "SVFID:" in out.stdout
    assert os.path.exists(os.path.join(infer, "videos", "fake_0_0.npy"))
    assert os.path.exists(os.path.join(infer, "videos", "fake_0_0.gif"))
    assert os.path.exists(os.path.join(infer, "real", "real_full_scale.npy"))
    # artifact contract: (T, H, W, C) uint8 at the saved scale's time depth
    fake = np.load(os.path.join(infer, "videos", "fake_0_0.npy"))
    real = np.load(os.path.join(infer, "real", "real_full_scale.npy"))
    assert fake.shape == real.shape and fake.dtype == np.uint8


def test_preprocess_serves_last_finalized_scale_when_inflight(tmp_path):
    """A mid-scale (--ckpt-interval) intermediate.json names the IN-PROGRESS
    scale; preprocess must resolve to the last FINALIZED one (its netG_<k>
    is the newest checkpoint that exists)."""
    import json

    import pytest

    from hpvaegan_tpu.config import Config
    from preprocess import pre_process

    cfg = Config(image_path=IMG, img_size=24, min_size=12,
                 max_size=24).finalize()
    cfg.ar = 1.0
    with open(tmp_path / "intermediate.json", "w") as f:
        json.dump({"noise_amps": [1.0, 0.1, 0.1], "scale_idx": 2,
                   "inflight": "inflight_2.ckpt", "inflight_iter": 4}, f)
    cfg.scale_idx = -1
    pre_process(cfg, str(tmp_path), seed=0)
    assert cfg.scale_idx == 1

    with open(tmp_path / "intermediate.json", "w") as f:
        json.dump({"noise_amps": [1.0], "scale_idx": 0,
                   "inflight": "inflight_0.ckpt", "inflight_iter": 4}, f)
    cfg.scale_idx = -1
    with pytest.raises(RuntimeError, match="mid-scale 0"):
        pre_process(cfg, str(tmp_path), seed=0)
