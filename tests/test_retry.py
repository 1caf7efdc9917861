"""Elastic-recovery test: a transient device failure mid-scale restarts the
scale from the previous checkpoint instead of killing the run."""

import os

import numpy as np

import hpvaegan_tpu.training.trainer as trainer_mod
from hpvaegan_tpu.config import Config

IMG = os.path.join(os.path.dirname(__file__), "..", "data", "imgs",
                   "air_balloons.jpg")


def test_scale_retry_on_transient_failure(tmp_path, monkeypatch):
    import jax.errors

    cfg = Config(image_path=IMG, checkname="rt", nfc=8, latent_dim=8,
                 num_layer=1, enc_blocks=1, niter=2, img_size=24, min_size=12,
                 max_size=24, vae_levels=1, print_interval=100,
                 run_dir=str(tmp_path), manualSeed=1).finalize()

    real_train_scale = trainer_mod.train_scale
    fails = {"armed": True}

    def flaky_train_scale(cfg, *args, **kwargs):
        if cfg.scale_idx == 1 and fails["armed"]:
            fails["armed"] = False
            raise jax.errors.JaxRuntimeError(
                "INTERNAL: simulated transport failure")
        return real_train_scale(cfg, *args, **kwargs)

    monkeypatch.setattr(trainer_mod, "train_scale", flaky_train_scale)
    g_params, _, amps, saver = trainer_mod.run_training(cfg, mode="image",
                                                        seed=1)
    assert not fails["armed"]  # the failure fired
    assert len(amps) == cfg.stop_scale + 1
    assert all(np.isfinite(a) for a in amps)
    assert os.path.exists(os.path.join(saver.experiment_dir,
                                       f"netG_{cfg.stop_scale}.ckpt"))


def test_non_finite_abort_not_retried(tmp_path, monkeypatch):
    cfg = Config(image_path=IMG, checkname="rt2", nfc=8, latent_dim=8,
                 num_layer=1, enc_blocks=1, niter=2, img_size=24, min_size=12,
                 max_size=24, vae_levels=1, print_interval=100,
                 run_dir=str(tmp_path), manualSeed=1).finalize()
    calls = {"n": 0}

    def aborting_train_scale(cfg, *args, **kwargs):
        calls["n"] += 1
        raise RuntimeError("non-finite training metrics ['g_loss']")

    monkeypatch.setattr(trainer_mod, "train_scale", aborting_train_scale)
    try:
        trainer_mod.run_training(cfg, mode="image", seed=1)
        assert False, "expected RuntimeError"
    except RuntimeError:
        pass
    assert calls["n"] == 1  # no retry of deliberate aborts


def test_snapshot_tree_host_normal():
    """Normal path: a host numpy snapshot, values bit-equal."""
    import jax
    import jax.numpy as jnp

    from hpvaegan_tpu.utils.saver import snapshot_tree

    tree = {"w": jnp.arange(6.0).reshape(2, 3), "k": jax.random.PRNGKey(1)}
    snap, kind = snapshot_tree(tree, timeout_s=60)
    assert kind == "host"
    assert isinstance(snap["w"], np.ndarray)
    np.testing.assert_array_equal(snap["w"], np.asarray(tree["w"]))


def test_retry_restore_survives_donation_with_device_snapshot(monkeypatch):
    """With a device-kind snapshot the restore must hand the chunk COPIES:
    a donating chunk deletes its input buffers, so an asarray (no-op)
    restore would let a second failure find the snapshot itself deleted —
    killing the run the retry path exists to save."""
    import types

    import jax
    import jax.errors
    import jax.numpy as jnp

    from hpvaegan_tpu.utils import saver

    monkeypatch.setattr(
        saver, "snapshot_tree",
        lambda tree, **kw: (jax.tree_util.tree_map(jnp.copy, tree), "device"))

    cfg = types.SimpleNamespace(scale_idx=0)
    attempts = {"n": 0}

    def train_fn(gp, gs, k, split):
        attempts["n"] += 1
        if attempts["n"] <= 2:
            # simulate donate_argnums: the failed chunk consumed its inputs
            for leaf in jax.tree_util.tree_leaves((gp, gs, k)):
                leaf.delete()
            raise jax.errors.JaxRuntimeError("INTERNAL: simulated")
        return np.asarray(gp["w"]).copy()

    out = trainer_mod.run_scale_with_retry(
        train_fn, cfg, {"w": jnp.ones((3,))}, {"s": jnp.zeros((2,))},
        jax.random.PRNGKey(0), retries=2)
    assert attempts["n"] == 3
    np.testing.assert_array_equal(out, np.ones((3,)))


def test_snapshot_tree_wedged_d2h_falls_back(monkeypatch):
    """A wedged d2h (remote-transport request drop) must not hang the
    trainer: a single hang recovers via the fresh-copy retry; when both
    attempts hang, the donation-safe device copies become the snapshot and
    the run proceeds (the wedge has been observed to clear; a truly dead
    channel is the external train_watchdog.sh supervisor's job)."""
    import time

    import jax.numpy as jnp

    from hpvaegan_tpu.utils import saver

    tree = {"w": jnp.ones((4,))}
    real = saver.tree_to_numpy
    calls = {"n": 0}

    def sometimes_wedged(t):
        calls["n"] += 1
        if calls["n"] == 1:
            time.sleep(3)  # longer than the timeout: simulated wedge
        return real(t)

    monkeypatch.setattr(saver, "tree_to_numpy", sometimes_wedged)
    snap, kind = saver.snapshot_tree(tree, timeout_s=0.5, retry_timeout_s=0.5)
    assert kind == "host-retry"
    np.testing.assert_array_equal(snap["w"], np.ones((4,)))

    def always_wedged(t):
        time.sleep(3)
        return real(t)

    # both attempts wedged -> donation-safe device copies become the
    # snapshot; the run proceeds (the external supervisor is the net)
    monkeypatch.setattr(saver, "tree_to_numpy", always_wedged)
    snap, kind = saver.snapshot_tree(tree, timeout_s=0.5, retry_timeout_s=0.5)
    assert kind == "device"
    assert snap["w"] is not tree["w"]  # fresh buffer: survives donation
    np.testing.assert_array_equal(np.asarray(jnp.asarray(snap["w"])),
                                  np.ones((4,)))
    time.sleep(3.2)  # let the daemon workers drain before pytest exits
