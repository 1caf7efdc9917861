"""StableHLO export round-trip tests (reference export.py:79-81 parity)."""

import numpy as np

from hpvaegan_tpu.config import Config
from hpvaegan_tpu.export.stablehlo import (export_sampler,
                                           load_and_run_serialized,
                                           save_exported,
                                           serving_input_specs)


def _tiny_generator():
    import jax

    from hpvaegan_tpu import models
    from hpvaegan_tpu.models.networks_2d import generator_init_next_stage

    cfg = Config(nfc=8, latent_dim=8, num_layer=1, enc_blocks=1, img_size=24,
                 min_size=12, max_size=24, vae_levels=1).finalize()
    cfg.ar = 1.0
    g_init, _ = models.get_generator("GeneratorHPVAEGAN", 2)
    p, s = g_init(cfg, jax.random.PRNGKey(0))
    p, s = generator_init_next_stage(cfg, p, s, jax.random.PRNGKey(1))
    return cfg, p, s


def test_export_roundtrip(tmp_path):
    cfg, p, s = _tiny_generator()
    exported = export_sampler(cfg, p, s, ndim=2)
    prefix = str(tmp_path / "netG")
    # multi-platform exports carry a hidden leading _platform_index arg, so
    # save_exported refuses to write a .mlir for them (the native runner
    # feeds exactly 3 inputs); export.py does a single-platform re-export
    # for the .mlir — mirror that here
    import pytest
    with pytest.raises(ValueError, match="multi-platform"):
        save_exported(exported, prefix)
    save_exported(exported, prefix, write_mlir=False)

    specs = serving_input_specs(cfg, ndim=2)
    rng = np.random.RandomState(0)
    noise = rng.standard_normal(specs[0].shape).astype(np.float32)
    amps = np.ones(specs[1].shape, np.float32)

    out = load_and_run_serialized(prefix + ".stablehlo", noise, amps,
                                  np.int32(7))
    assert out.shape[0] == 1 and out.shape[1] == cfg.nc_im  # NCHW out
    assert np.isfinite(np.asarray(out)).all()
    # deterministic for a fixed seed, different for another seed
    out2 = load_and_run_serialized(prefix + ".stablehlo", noise, amps,
                                   np.int32(7))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = load_and_run_serialized(prefix + ".stablehlo", noise, amps,
                                   np.int32(8))
    assert np.abs(np.asarray(out) - np.asarray(out3)).max() > 0

    # the native-runner .mlir comes from a SINGLE-platform export (no
    # hidden _platform_index arg), like export.py's second export
    single = export_sampler(cfg, p, s, ndim=2, platforms=("cpu",))
    save_exported(single, prefix)
    text = open(prefix + ".mlir").read()
    assert "stablehlo" in text and "noise_init" in text


def test_export_batched_bn_is_per_sample(tmp_path):
    """--batch-size N export must keep BN statistics per sample: sample 0's
    output may not depend on sample 1's noise (a plain batched train-mode
    forward would couple them through pooled batch stats)."""
    cfg, p, s = _tiny_generator()
    exported = export_sampler(cfg, p, s, ndim=2, batch=2)
    prefix = str(tmp_path / "netG_b2")
    save_exported(exported, prefix, write_mlir=False)

    specs = serving_input_specs(cfg, ndim=2, batch=2)
    rng = np.random.RandomState(0)
    noise = rng.standard_normal(specs[0].shape).astype(np.float32)
    amps = np.ones(specs[1].shape, np.float32)

    out_a = np.asarray(load_and_run_serialized(prefix + ".stablehlo", noise,
                                               amps, np.int32(3)))
    noise_b = noise.copy()
    noise_b[1] = rng.standard_normal(noise[1].shape).astype(np.float32)
    out_b = np.asarray(load_and_run_serialized(prefix + ".stablehlo", noise_b,
                                               amps, np.int32(3)))
    np.testing.assert_array_equal(out_a[0], out_b[0])  # decoupled
    assert np.abs(out_a[1] - out_b[1]).max() > 0       # sample 1 did change
