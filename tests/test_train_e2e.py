"""Tiny end-to-end training runs (CPU): the minimum end-to-end slice of
SURVEY §7 step 6 — scale loop, VAE phase, GAN phase with SN + WGAN-GP,
noise-amp calibration, checkpointing."""

import json
import os

import numpy as np
import pytest

from hpvaegan_tpu.config import Config
from hpvaegan_tpu.training.trainer import run_training
from hpvaegan_tpu.utils.saver import load_pytree

IMG = os.path.join(os.path.dirname(__file__), "..", "data", "imgs",
                   "air_balloons.jpg")
VID = os.path.join(os.path.dirname(__file__), "..", "data", "vids",
                   "synthetic.avi")


def test_train_image_e2e(tmp_path):
    cfg = Config(image_path=IMG, checkname="t", nfc=8, latent_dim=8,
                 num_layer=1, enc_blocks=1, niter=2, img_size=24, min_size=12,
                 max_size=24, vae_levels=1, hflip=True, print_interval=100,
                 run_dir=str(tmp_path), manualSeed=1).finalize()
    n_scales = cfg.stop_scale + 1
    assert n_scales >= 3
    g_params, g_state, amps, saver = run_training(cfg, mode="image", seed=1)

    # grown to all scales
    assert len(g_params["body"]) == cfg.stop_scale
    # noise amps: one per scale, scale 0 == 1.0, others calibrated > 0
    assert len(amps) == n_scales
    assert amps[0] == 1.0
    assert all(a > 0 for a in amps)
    # checkpoint contract (reference train_image.py:206-210)
    inter = json.load(open(os.path.join(saver.experiment_dir,
                                        "intermediate.json")))
    assert inter["scale_idx"] == cfg.stop_scale
    assert inter["noise_amps"] == amps
    for k in range(n_scales):
        assert os.path.exists(os.path.join(saver.experiment_dir,
                                           f"netG_{k}.ckpt"))
    # GAN scales saved a discriminator; VAE scales did not
    assert not os.path.exists(os.path.join(saver.experiment_dir, "netD_0.ckpt"))
    assert os.path.exists(os.path.join(saver.experiment_dir,
                                       f"netD_{cfg.stop_scale}.ckpt"))
    ckpt = load_pytree(os.path.join(saver.experiment_dir, "netG_0.ckpt"))
    assert "params" in ckpt and "state" in ckpt
    # params finite
    flat = [np.asarray(x) for x in
            __import__("jax").tree_util.tree_leaves(g_params)]
    assert all(np.isfinite(a).all() for a in flat)


def test_train_image_vae_nb_e2e(tmp_path):
    """GeneratorVAE_nb trains through VAE and GAN phases (the reference's
    GWithLoss could only consume the 4-output generator)."""
    cfg = Config(image_path=IMG, checkname="nb", generator="GeneratorVAE_nb",
                 nfc=8, latent_dim=8, num_layer=1, enc_blocks=1, niter=2,
                 img_size=24, min_size=12, max_size=24, vae_levels=1,
                 print_interval=100, run_dir=str(tmp_path),
                 manualSeed=1).finalize()
    g_params, _, amps, _ = run_training(cfg, mode="image", seed=1)
    assert len(amps) == cfg.stop_scale + 1
    assert all(np.isfinite(a) for a in amps)
    assert len(g_params["body"]) == cfg.stop_scale


def test_train_image_fused_dg_e2e(tmp_path):
    """--fused-dg mode: D and G share one fake forward (XLA CSE)."""
    cfg = Config(image_path=IMG, checkname="fdg", nfc=8, latent_dim=8,
                 num_layer=1, enc_blocks=1, niter=2, img_size=24, min_size=12,
                 max_size=24, vae_levels=1, fused_dg=True, print_interval=100,
                 run_dir=str(tmp_path), manualSeed=1).finalize()
    g_params, _, amps, _ = run_training(cfg, mode="image", seed=1)
    assert all(np.isfinite(a) for a in amps)
    assert len(g_params["body"]) == cfg.stop_scale


@pytest.mark.slow
def test_train_video_e2e(tmp_path):
    cfg = Config(video_path=VID, checkname="tv", nfc=8, latent_dim=8,
                 num_layer=1, enc_blocks=1, niter=2, img_size=18, min_size=9,
                 max_size=18, vae_levels=1, sampling_rates=[2, 1], max_frames=5,
                 discriminator="WDiscriminator3D", print_interval=100,
                 run_dir=str(tmp_path), manualSeed=1).finalize()
    g_params, g_state, amps, saver = run_training(cfg, mode="video", seed=1)
    assert len(amps) == cfg.stop_scale + 1
    assert all(a > 0 for a in amps)
    assert os.path.exists(os.path.join(saver.experiment_dir,
                                       f"netG_{cfg.stop_scale}.ckpt"))


def test_compile_ahead_matches_normal(tmp_path):
    """--compile-ahead must be behavior-neutral: same seed, same final
    noise_amps and params as the normal compile-at-first-call path."""
    import jax
    import numpy as np

    from hpvaegan_tpu.config import Config
    from hpvaegan_tpu.training.trainer import run_training

    def run(ca, sub):
        cfg = Config(image_path=IMG, checkname=f"ca{sub}", nfc=8, latent_dim=8,
                     num_layer=1, enc_blocks=1, niter=3, img_size=24,
                     min_size=12, max_size=24, vae_levels=1,
                     steps_per_call=2, compile_ahead=ca,
                     run_dir=str(tmp_path / sub), manualSeed=3).finalize()
        return run_training(cfg, mode="image", seed=3)

    p1, _, amps1, _ = run(False, "off")
    p2, _, amps2, _ = run(True, "on")
    np.testing.assert_allclose(amps1, amps2, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_compile_ahead_video(tmp_path):
    """compile-ahead on the VIDEO trainer: exercises _snapshot_cfg's
    fps/time-depth advancement for the next scale."""
    import numpy as np

    from hpvaegan_tpu.config import Config
    from hpvaegan_tpu.training.trainer import run_training

    cfg = Config(video_path=VID, checkname="cav", nfc=8, latent_dim=8,
                 num_layer=1, enc_blocks=1, niter=2, img_size=18, min_size=9,
                 max_size=18, vae_levels=1, sampling_rates=[2, 1],
                 stop_scale_time=-1, max_frames=5, steps_per_call=2,
                 discriminator="WDiscriminator3D",
                 compile_ahead=True, run_dir=str(tmp_path),
                 manualSeed=2).finalize()
    _, _, amps, _ = run_training(cfg, mode="video", seed=2)
    assert len(amps) == cfg.stop_scale + 1
    assert all(np.isfinite(a) for a in amps)


def test_video_too_few_frames_fails_loudly(tmp_path):
    """A clip shorter than fps_lcm+1 frames must raise a clear ValueError at
    dataset construction, not an obscure dynamic_slice trace error minutes
    later inside the first remote chunk compile."""
    import pytest

    from hpvaegan_tpu.data.video import SingleVideoDataset

    cfg = Config(video_path=VID, checkname="short", img_size=18, min_size=9,
                 max_size=18, sampling_rates=[4, 3, 2, 1], max_frames=5,
                 run_dir=str(tmp_path), manualSeed=1).finalize()
    with pytest.raises(ValueError, match="frames per temporal window"):
        SingleVideoDataset(cfg)


def test_amp_calibration_batch_invariant_unless_bug_compat(tmp_path):
    """Reference bug #3 (train_image.py:147): the batch-mean RMSE is divided
    by batch_size AGAIN, shrinking the injected noise amp batch-fold at
    batch>1 (latent in the reference — it only trains batch 1). Default
    fixes it (batch-invariant amp); --bug-compat restores the division.
    Same seed => identical state at the first calibration, so the two
    calibrated amps differ by exactly batch_size."""
    def run(bug_compat, sub):
        cfg = Config(image_path=IMG, checkname="a", nfc=8, latent_dim=8,
                     num_layer=1, enc_blocks=1, niter=2, img_size=24,
                     min_size=12, max_size=24, vae_levels=1, batch_size=4,
                     bug_compat=bug_compat, print_interval=100,
                     run_dir=str(tmp_path / sub), manualSeed=1).finalize()
        return run_training(cfg, mode="image", seed=1)[2]

    amps_fixed = run(False, "fixed")
    amps_compat = run(True, "compat")
    # scale 0 is not calibrated (amp == 1) in both regimes
    assert amps_fixed[0] == 1.0 and amps_compat[0] == 1.0
    # scale 1's calibration runs on identical params/key in both runs:
    # the only difference is the division
    np.testing.assert_allclose(amps_fixed[1], 4 * amps_compat[1], rtol=1e-6)
    assert len(amps_fixed) == len(amps_compat)
