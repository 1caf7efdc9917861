"""Pallas kernel tests (interpret mode on CPU; exact on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpvaegan_tpu.ops.resize import resize_bilinear


def _run_fused(x, out_hw, amp, seed):
    from jax.experimental.pallas import tpu as pltpu

    from hpvaegan_tpu.ops.pallas.upsample_noise import fused_upscale_noise_2d

    if jax.default_backend() != "tpu":
        with pltpu.force_tpu_interpret_mode():
            return fused_upscale_noise_2d(x, out_hw, amp, seed)
    return fused_upscale_noise_2d(x, out_hw, amp, seed)


def test_fused_upscale_matches_xla_resize():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 17, 17, 3))
    clean, noised = _run_fused(x, (21, 21), amp=0.0, seed=3)
    want = resize_bilinear(x, (21, 21), align_corners=True)
    np.testing.assert_allclose(np.asarray(clean), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(noised), np.asarray(clean),
                               rtol=1e-6, atol=1e-6)  # amp=0 -> identical


def test_fused_upscale_noise_statistics_and_determinism():
    x = jnp.zeros((2, 17, 17, 3))
    clean, noised = _run_fused(x, (33, 33), amp=1.0, seed=5)
    noise = np.asarray(noised - clean)
    assert np.isfinite(noise).all()
    _, noised2 = _run_fused(x, (33, 33), amp=1.0, seed=5)
    np.testing.assert_array_equal(np.asarray(noised), np.asarray(noised2))
    if jax.default_backend() != "tpu":
        # interpret-mode pltpu.prng_random_bits returns zero bits; the
        # hardware-PRNG statistics below only hold on a real TPU
        return
    assert abs(noise.mean()) < 0.05
    assert abs(noise.std() - 1.0) < 0.05
    assert np.abs(noise[0] - noise[1]).max() > 0  # per-element streams
    _, noised3 = _run_fused(x, (33, 33), amp=1.0, seed=6)
    assert np.abs(np.asarray(noised3) - np.asarray(noised)).max() > 0


def test_sampler_with_pallas_flag_runs():
    if jax.default_backend() != "tpu":
        pytest.skip("pallas_fused_sampling path compiles on TPU only")
