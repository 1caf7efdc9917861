"""Checkpoint/resume test (reference: train_image.py:361-379 --netG +
--intermediate restore scale index and noise amps, replay init_next_stage,
load params, retrain the resumed scale)."""

import json
import os
import shutil

from hpvaegan_tpu.config import Config
from hpvaegan_tpu.training.trainer import run_training

IMG = os.path.join(os.path.dirname(__file__), "..", "data", "imgs",
                   "air_balloons.jpg")


def _cfg(run_dir, **kw):
    base = dict(image_path=IMG, checkname="r", nfc=8, latent_dim=8,
                num_layer=1, enc_blocks=1, niter=2, img_size=24, min_size=12,
                max_size=24, vae_levels=1, print_interval=100,
                run_dir=run_dir, manualSeed=1)
    base.update(kw)
    return Config(**base).finalize()


def test_inflight_midscale_resume_exact(tmp_path):
    """--ckpt-interval: a run killed mid-scale resumes from the inflight
    full-state checkpoint (G+D params/state, optimizer states, RNG) and
    finishes BIT-EXACTLY equal to an uninterrupted same-seed run — the
    scale-end-only cadence would instead retrain the whole scale."""
    import jax
    import numpy as np

    kw = dict(niter=6, steps_per_call=2, ckpt_interval=2,
              compile_ahead=False)
    cfg_a = _cfg(str(tmp_path / "a"), **kw)
    g_a, _, amps_a, _ = run_training(cfg_a, mode="image", seed=1)

    class Boom(Exception):
        pass

    cfg_b = _cfg(str(tmp_path / "b"), **kw)
    last = cfg_b.stop_scale

    def cb(done, state, metrics):
        if cfg_b.scale_idx == last and done == 4:
            raise Boom()  # kill mid-scale, after the iter-4 inflight save

    try:
        run_training(cfg_b, mode="image", seed=1, step_callback=cb)
        assert False, "expected the simulated kill"
    except Boom:
        pass
    exp_b = cfg_b.saver.experiment_dir
    with open(os.path.join(exp_b, "intermediate.json")) as f:
        inter = json.load(f)
    assert inter["inflight"] == f"inflight_{last}.ckpt"
    assert inter["inflight_iter"] == 4
    assert len(inter["noise_amps"]) == last + 1

    cfg_c = _cfg(str(tmp_path / "c"), **kw)
    cfg_c.netG = os.path.join(exp_b, inter["inflight"])
    cfg_c.intermediate = os.path.join(exp_b, "intermediate.json")
    g_c, _, amps_c, saver_c = run_training(cfg_c, mode="image", seed=1)

    assert amps_a == amps_c
    la, lc = (jax.tree_util.tree_leaves(t) for t in (g_a, g_c))
    assert len(la) == len(lc)
    for a, c in zip(la, lc):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    # the completed resumed scale cleared its inflight checkpoint and
    # the final intermediate.json dropped the marker
    assert not os.path.exists(os.path.join(saver_c.experiment_dir,
                                           f"inflight_{last}.ckpt"))
    with open(os.path.join(saver_c.experiment_dir,
                           "intermediate.json")) as f:
        assert "inflight" not in json.load(f)


def test_video_inflight_resume_exact(tmp_path):
    """Video mode shares train_scale but forms batches through the temporal
    window body — the inflight round-trip must be bit-exact there too."""
    import jax
    import numpy as np

    VID = os.path.join(os.path.dirname(__file__), "..", "data", "vids",
                       "synthetic.avi")

    def _vcfg(run_dir):
        return Config(video_path=VID, checkname="vr", nfc=8, latent_dim=8,
                      num_layer=1, enc_blocks=1, niter=6, img_size=18,
                      min_size=9, max_size=18, sampling_rates=[2, 1],
                      max_frames=5, vae_levels=1,
                      discriminator="WDiscriminator3D", print_interval=100,
                      steps_per_call=2, ckpt_interval=2,
                      compile_ahead=False, run_dir=run_dir,
                      manualSeed=1).finalize()

    cfg_a = _vcfg(str(tmp_path / "a"))
    g_a, _, amps_a, _ = run_training(cfg_a, mode="video", seed=1)

    class Boom(Exception):
        pass

    cfg_b = _vcfg(str(tmp_path / "b"))
    last = cfg_b.stop_scale

    def cb(done, state, metrics):
        if cfg_b.scale_idx == last and done == 4:
            raise Boom()

    try:
        run_training(cfg_b, mode="video", seed=1, step_callback=cb)
        assert False, "expected the simulated kill"
    except Boom:
        pass
    exp_b = cfg_b.saver.experiment_dir
    with open(os.path.join(exp_b, "intermediate.json")) as f:
        inter = json.load(f)
    assert inter["inflight"] == f"inflight_{last}.ckpt"

    cfg_c = _vcfg(str(tmp_path / "c"))
    cfg_c.netG = os.path.join(exp_b, inter["inflight"])
    cfg_c.intermediate = os.path.join(exp_b, "intermediate.json")
    g_c, _, amps_c, _ = run_training(cfg_c, mode="video", seed=1)

    assert amps_a == amps_c
    for a, c in zip(jax.tree_util.tree_leaves(g_a),
                    jax.tree_util.tree_leaves(g_c)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_baselines_inflight_resume_exact(tmp_path):
    """The baselines trainer supports the same --netG/--intermediate resume
    as the reference driver (train_video_baselines.py:342-360) plus
    mid-scale inflight resume; Z_init is reloaded, not re-randomized (the
    reference silently changes the reconstruction target on resume)."""
    import jax
    import numpy as np

    from hpvaegan_tpu.training.baselines_trainer import run_training as run_b

    VID = os.path.join(os.path.dirname(__file__), "..", "data", "vids",
                       "synthetic.avi")

    def _bcfg(run_dir):
        return Config(video_path=VID, checkname="br", nfc=8, num_layer=1,
                      niter=6, img_size=18, min_size=9, max_size=18,
                      sampling_rates=[2, 1], max_frames=5,
                      generator="GeneratorCSG",
                      discriminator="WDiscriminatorBaselines",
                      print_interval=100, steps_per_call=2, ckpt_interval=2,
                      run_dir=run_dir, manualSeed=1).finalize()

    cfg_a = _bcfg(str(tmp_path / "a"))
    g_a, _, amps_a, _ = run_b(cfg_a, seed=1)

    class Boom(Exception):
        pass

    cfg_b = _bcfg(str(tmp_path / "b"))
    last = cfg_b.stop_scale

    def cb(done, state, metrics):
        if cfg_b.scale_idx == last and done == 4:
            raise Boom()

    try:
        run_b(cfg_b, seed=1, step_callback=cb)
        assert False, "expected the simulated kill"
    except Boom:
        pass
    exp_b = cfg_b.saver.experiment_dir
    with open(os.path.join(exp_b, "intermediate.json")) as f:
        inter = json.load(f)
    assert inter["inflight"] == f"inflight_{last}.ckpt"

    cfg_c = _bcfg(str(tmp_path / "c"))
    cfg_c.netG = os.path.join(exp_b, inter["inflight"])
    cfg_c.intermediate = os.path.join(exp_b, "intermediate.json")
    g_c, _, amps_c, saver_c = run_b(cfg_c, seed=1)

    assert amps_a == amps_c
    # Z_init carried over, not re-randomized
    np.testing.assert_array_equal(
        np.load(os.path.join(exp_b, "Z_init.npy")),
        np.load(os.path.join(saver_c.experiment_dir, "Z_init.npy")))
    la, lc = (jax.tree_util.tree_leaves(t) for t in (g_a, g_c))
    assert len(la) == len(lc)
    for a, c in zip(la, lc):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_resume_from_mid_run(tmp_path):
    cfg = _cfg(str(tmp_path / "a"))
    g_params, _, amps, saver = run_training(cfg, mode="image", seed=1)
    n_scales = cfg.stop_scale + 1
    assert len(g_params["body"]) == cfg.stop_scale

    # simulate an interrupted run: keep only scale<=1 artifacts
    resume_dir = tmp_path / "interrupted"
    resume_dir.mkdir()
    shutil.copy(os.path.join(saver.experiment_dir, "netG_1.ckpt"),
                resume_dir / "netG_1.ckpt")
    with open(resume_dir / "intermediate.json", "w") as f:
        json.dump({"noise_amps": amps[:2], "scale_idx": 1}, f)

    cfg2 = _cfg(str(tmp_path / "b"))
    cfg2.netG = str(resume_dir / "netG_1.ckpt")
    cfg2.intermediate = str(resume_dir / "intermediate.json")
    g_params2, _, amps2, saver2 = run_training(cfg2, mode="image", seed=2)

    # grew back to full depth and recalibrated amps for scales >= 1
    assert len(g_params2["body"]) == cfg2.stop_scale
    assert len(amps2) == n_scales
    assert amps2[0] == amps[0] == 1.0
    assert os.path.exists(os.path.join(saver2.experiment_dir,
                                       f"netG_{cfg2.stop_scale}.ckpt"))


def test_inflight_resume_exact_with_visualize(tmp_path):
    """The inflight save must come AFTER the visualization block: viz
    advances the outer RNG key, and a pre-viz snapshot resumes with a key
    the uninterrupted run no longer has. split_step makes the divergence
    maximal (the outer key feeds every subsequent batch), and
    image_interval == the kill iteration makes the ckpt/viz boundaries
    coincide — the exact scenario the ordering bug corrupted."""
    import jax
    import numpy as np

    kw = dict(niter=6, steps_per_call=2, ckpt_interval=2, split_step=True,
              visualize=True, image_interval=4, compile_ahead=False)
    cfg_a = _cfg(str(tmp_path / "a"), **kw)
    g_a, _, amps_a, _ = run_training(cfg_a, mode="image", seed=1)

    class Boom(Exception):
        pass

    cfg_b = _cfg(str(tmp_path / "b"), **kw)
    last = cfg_b.stop_scale

    def cb(done, state, metrics):
        if cfg_b.scale_idx == last and done == 4:
            raise Boom()

    try:
        run_training(cfg_b, mode="image", seed=1, step_callback=cb)
        assert False, "expected the simulated kill"
    except Boom:
        pass
    exp_b = cfg_b.saver.experiment_dir
    with open(os.path.join(exp_b, "intermediate.json")) as f:
        inter = json.load(f)
    assert inter["inflight_iter"] == 4

    cfg_c = _cfg(str(tmp_path / "c"), **kw)
    cfg_c.netG = os.path.join(exp_b, inter["inflight"])
    cfg_c.intermediate = os.path.join(exp_b, "intermediate.json")
    g_c, _, amps_c, _ = run_training(cfg_c, mode="image", seed=1)

    assert amps_a == amps_c
    for a, c in zip(jax.tree_util.tree_leaves(g_a),
                    jax.tree_util.tree_leaves(g_c)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_finalized_scale_resume_continues_next_scale_exact(tmp_path):
    """A kill landing AFTER a scale's finalize but BEFORE the next scale's
    first inflight checkpoint must resume at the NEXT scale bit-exactly:
    our finalize marker stores the end-of-scale outer PRNG key, so the
    finished scale is never retrained. (The reference's keyless marker
    retrains it from its own trained params — train_image.py:361-379 —
    double-training the scale and recalibrating its amp; that compat path
    stays pinned by test_resume_from_mid_run.) The resumed run gets a
    DIFFERENT seed to prove the marker key, not the CLI seed, governs."""
    import jax
    import numpy as np

    cfg_a = _cfg(str(tmp_path / "a"))
    g_a, _, amps_a, _ = run_training(cfg_a, mode="image", seed=1)
    assert cfg_a.stop_scale >= 2

    class Boom(Exception):
        pass

    cfg_b = _cfg(str(tmp_path / "b"))

    def cb(done, state, metrics):
        if cfg_b.scale_idx == 2:
            raise Boom()

    try:
        run_training(cfg_b, mode="image", seed=1, step_callback=cb)
        assert False, "expected the simulated kill"
    except Boom:
        pass
    exp_b = cfg_b.saver.experiment_dir
    with open(os.path.join(exp_b, "intermediate.json")) as f:
        inter = json.load(f)
    # on-disk state: scale 1 finalized (keyed marker), scale 2's work lost
    assert inter["scale_idx"] == 1 and "key" in inter
    assert not inter.get("inflight")

    cfg_c = _cfg(str(tmp_path / "c"))
    cfg_c.netG = os.path.join(exp_b, "netG_1.ckpt")
    cfg_c.intermediate = os.path.join(exp_b, "intermediate.json")
    g_c, _, amps_c, saver_c = run_training(cfg_c, mode="image", seed=99)

    assert amps_a == amps_c
    for a, c in zip(jax.tree_util.tree_leaves(g_a),
                    jax.tree_util.tree_leaves(g_c)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    # the fresh experiment dir is self-contained: the netD warm-start the
    # resumed scale 2 used was copied in from the interrupted run
    assert os.path.exists(os.path.join(saver_c.experiment_dir,
                                       "netD_1.ckpt"))
