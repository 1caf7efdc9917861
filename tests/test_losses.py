"""Unit tests for KL / WGAN-GP / generator losses."""

import jax
import jax.numpy as jnp
import numpy as np

from hpvaegan_tpu import losses
from hpvaegan_tpu.config import Config


def test_kl_criterion_zero_at_standard_normal():
    mu = jnp.zeros((2, 4, 4, 3))
    logvar = jnp.zeros((2, 4, 4, 3))
    assert float(losses.kl_criterion(mu, logvar)) == 0.0
    # positive away from N(0,1)
    assert float(losses.kl_criterion(mu + 1.0, logvar)) > 0.4


def test_kl_bern_zero_at_half():
    x = jnp.full((3, 5), 0.5)
    np.testing.assert_allclose(float(losses.kl_bern_criterion(x)), 0, atol=1e-6)
    assert float(losses.kl_bern_criterion(jnp.full((3, 5), 0.9))) > 0.2


def test_gradient_penalty_linear_d():
    # D(x) = sum(2x) -> per-channel grad = 2 everywhere, per-pixel channel
    # norm = 2*sqrt(C); penalty = (2*sqrt(C)-1)^2 * lam
    def d_apply(x):
        return 2.0 * jnp.sum(x, axis=(1, 2, 3))

    real = jnp.ones((2, 4, 4, 3))
    fake = jnp.zeros((2, 4, 4, 3))
    got = float(losses.gradient_penalty(d_apply, real, fake, 0.3, lam=10.0))
    want = (2 * np.sqrt(3) - 1) ** 2 * 10.0
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_d_loss_components():
    cfg = Config(lambda_grad=0.0)

    def d_apply(x):
        return jnp.mean(x, axis=(1, 2, 3), keepdims=True)

    real = jnp.ones((2, 4, 4, 3))
    fake = -jnp.ones((2, 4, 4, 3))
    total, aux = losses.d_loss_fn(cfg, d_apply, real, fake, 0.5)
    # -E[D(real)] + E[D(fake)] = -1 + -1 = -2
    np.testing.assert_allclose(float(total), -2.0, rtol=1e-5)
    np.testing.assert_allclose(float(aux["d_real"]), 1.0, rtol=1e-5)


def test_g_gan_loss_bug_compat_severs_grad():
    base = Config(rec_weight=0.0, disc_loss_weight=1.0)

    def d_apply(x):
        return x  # identity

    real = jnp.zeros((1, 2, 2, 1))

    def make_loss(cfg):
        def loss(fake_src):
            fake = fake_src * 3.0
            total, _ = losses.g_gan_loss_fn(cfg, d_apply, real, real, fake)
            return total
        return loss

    x = jnp.ones((1, 2, 2, 1))
    g_fixed = jax.grad(make_loss(base))(x)
    assert float(jnp.abs(g_fixed).sum()) > 0  # adversarial grad flows (fixed)
    base.bug_compat = True
    g_bug = jax.grad(make_loss(base))(x)
    assert float(jnp.abs(g_bug).sum()) == 0  # reference losses.py:94 behavior
