"""Losses: KL terms, WGAN-GP discriminator loss, VAE/GAN generator loss.

Functional re-design of reference src/modules/losses.py:5-107. The with-loss
cells dissolve into pure loss functions suitable for jax.value_and_grad; the
WGAN gradient penalty is grad-inside-grad (jax.grad of D w.r.t. its input,
inside the outer loss grad).

Reference bugs handled (SURVEY §7):
  * frozen GP alpha (losses.py:26 draws alpha once in __init__): fixed — alpha
    is drawn per step from the step key; cfg.bug_compat freezes it to 0.5.
  * severed adversarial G gradient (losses.py:94 stop_gradients the fake
    before D): fixed — the adversarial term backpropagates into G;
    cfg.bug_compat restores the reference's severed gradient.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def kl_criterion(mu, logvar):
    """KL(q||N(0,1)), mean-reduced (reference: losses.py:5-7)."""
    kld = -0.5 * (1 + logvar - jnp.power(mu, 2) - jnp.exp(logvar))
    return jnp.mean(kld)


def kl_bern_criterion(x):
    """Bernoulli KL vs p=0.5 (reference: losses.py:10-14)."""
    kld = x * (jnp.log(x + 1e-20) - jnp.log(0.5)) + \
        (1 - x) * (jnp.log(1 - x + 1e-20) - jnp.log(0.5))
    return jnp.mean(kld)


def mse(a, b):
    # losses always in f32 (activations may flow in bf16)
    return jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)


def gradient_penalty(d_apply, real, fake, alpha, lam):
    """WGAN-GP (reference: losses.py:47-52).

    Matches the reference's per-CHANNEL gradient norm (LpNorm(p=2, axis=1) —
    inherited from the original HP-VAE-GAN torch code), here axis=-1 since
    arrays are channels-last. `d_apply` must be a pure fn of the interpolate.
    """
    interp = alpha * real + (1 - alpha) * fake

    def d_sum(x):
        return jnp.sum(d_apply(x).astype(jnp.float32))

    grads = jax.grad(d_sum)(interp)
    grads = grads.astype(jnp.float32)
    norms = jnp.sqrt(jnp.sum(grads ** 2, axis=-1) + 1e-12)
    return jnp.mean((norms - 1) ** 2) * lam


def d_loss_fn(cfg, d_apply, real, fake, alpha):
    """Discriminator loss: -E[D(real)] + E[D(fake)] + GP
    (reference: losses.py:27-45; fake is stop_gradient'ed by the caller).

    Applies d_apply to `real` FIRST — steps._d_step_core captures the
    spectral-norm (u,v) state update from that first application.

    Keeps the reference's separate D applications deliberately: batching
    them measured SLOWER on v5e despite exact per-sample semantics (no BN
    in D) — real|fake|interp in one width-3B graph 29.7 steps/s and
    real|fake in one width-2B graph 44.4 vs 46.8 separate; the GP
    double-backward width and the forced concat materialization eat the
    op-count saving (docs/PERF.md)."""
    err_real = -jnp.mean(d_apply(real).astype(jnp.float32))
    err_fake = jnp.mean(d_apply(fake).astype(jnp.float32))
    gp = gradient_penalty(d_apply, real, fake, alpha, cfg.lambda_grad)
    return err_real + err_fake + gp, {"d_real": -err_real, "d_fake": err_fake,
                                      "gp": gp}


def g_vae_loss_fn(cfg, generated, generated_vae, real, real_zero, mu, logvar):
    """VAE-phase G loss (reference: losses.py:79-85)."""
    rec = mse(generated, real) + mse(generated_vae, real_zero)
    kl = kl_criterion(mu, logvar)
    total = cfg.rec_weight * rec + cfg.kl_weight * kl
    return total, {"rec": rec, "kl": kl}


def g_gan_loss_fn(cfg, d_apply, generated, real, fake):
    """GAN-phase G loss: rec + adversarial (reference: losses.py:87-101)."""
    rec = mse(generated, real)
    if cfg.bug_compat:
        fake = jax.lax.stop_gradient(fake)  # reference losses.py:94
    adv = -jnp.mean(d_apply(fake).astype(jnp.float32)) * cfg.disc_loss_weight
    total = cfg.rec_weight * rec + adv
    return total, {"rec": rec, "adv": adv}
