"""Shape/behavior tests for the 2D/3D model zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpvaegan_tpu import models
from hpvaegan_tpu.config import Config
from hpvaegan_tpu.models.networks_2d import generator_init_next_stage
from hpvaegan_tpu.models import networks_3d
from hpvaegan_tpu.utils.pyramid import scale_size_2d, scale_size_3d


def tiny_cfg(**kw):
    base = dict(nfc=8, latent_dim=8, num_layer=1, enc_blocks=1, img_size=32,
                min_size=16, max_size=32, vae_levels=2, sampling_rates=[2, 1],
                stop_scale_time=-1)
    base.update(kw)
    cfg = Config(**base).finalize()
    cfg.ar = 1.0
    cfg.org_fps = 24.0
    cfg.fps_lcm = 2
    return cfg


def test_generator_2d_grows_and_outputs_scale_size():
    cfg = tiny_cfg()
    g_init, g_apply = models.get_generator("GeneratorHPVAEGAN", 2)
    p, s = g_init(cfg, jax.random.PRNGKey(0))
    assert p["body"] == []
    amps = jnp.ones((cfg.stop_scale + 2,))
    h0, w0 = scale_size_2d(0, cfg.scale_factor, cfg.stop_scale, cfg.img_size, 1.0)
    x = jnp.zeros((1, h0, w0, 3))
    out, _ = g_apply(cfg, p, s, video=x, amps=amps, key=jax.random.PRNGKey(1),
                     train=True)
    assert out[0].shape == (1, h0, w0, 3)  # empty body -> vae_out passthrough
    for k in range(2):
        p, s = generator_init_next_stage(cfg, p, s, jax.random.PRNGKey(k))
    h2, w2 = scale_size_2d(2, cfg.scale_factor, cfg.stop_scale, cfg.img_size, 1.0)
    out, _ = g_apply(cfg, p, s, video=x, amps=amps, key=jax.random.PRNGKey(1),
                     train=True)
    assert out[0].shape == (1, h2, w2, 3)
    assert out[1].shape == (1, h0, w0, 3)  # vae_out stays at scale 0
    # random mode
    z = jnp.zeros((1, h0, w0, cfg.latent_dim))
    out, _ = g_apply(cfg, p, s, noise_init=z, amps=amps,
                     key=jax.random.PRNGKey(2), is_random=True, train=True)
    assert out[0].shape == (1, h2, w2, 3)
    assert out[2] is None  # no mu in random mode


def test_init_next_stage_copies_are_independent():
    cfg = tiny_cfg()
    g_init, _ = models.get_generator("GeneratorHPVAEGAN", 2)
    p, s = g_init(cfg, jax.random.PRNGKey(0))
    p, s = generator_init_next_stage(cfg, p, s, jax.random.PRNGKey(1))
    p, s = generator_init_next_stage(cfg, p, s, jax.random.PRNGKey(2))
    w0 = np.asarray(p["body"][0]["blocks"][0]["conv"]["w"])
    w1 = np.asarray(p["body"][1]["blocks"][0]["conv"]["w"])
    np.testing.assert_array_equal(w0, w1)  # deep copy of previous stage
    p["body"][1]["blocks"][0]["conv"]["w"] = jnp.zeros_like(w1)
    assert np.abs(np.asarray(p["body"][0]["blocks"][0]["conv"]["w"])).sum() > 0


def test_generator_vae_nb_2d():
    cfg = tiny_cfg(generator="GeneratorVAE_nb")
    g_init, g_apply = models.get_generator("GeneratorVAE_nb", 2)
    p, s = g_init(cfg, jax.random.PRNGKey(0))
    amps = jnp.ones((cfg.stop_scale + 2,))
    h0, w0 = scale_size_2d(0, cfg.scale_factor, cfg.stop_scale, cfg.img_size, 1.0)
    x = jnp.zeros((1, h0, w0, 3))
    out, _ = g_apply(cfg, p, s, video=x, amps=amps, key=jax.random.PRNGKey(1),
                     train=True)
    x_out, vae_out, mu, logvar, bern = out
    assert mu.shape == (1, 1, 1, cfg.latent_dim)  # globally pooled
    assert bern.shape == (1, h0, w0, 1)


def test_discriminator_3d_and_generator_3d():
    cfg = tiny_cfg(discriminator="WDiscriminator3D")
    g_init, g_apply = models.get_generator("GeneratorHPVAEGAN", 3)
    p, s = g_init(cfg, jax.random.PRNGKey(0))
    p, s = networks_3d.generator_init_next_stage(cfg, p, s, jax.random.PRNGKey(1))
    t0, h0, w0 = scale_size_3d(0, cfg.scale_factor, cfg.stop_scale, cfg.img_size,
                               cfg.stop_scale_time, cfg.sampling_rates,
                               cfg.org_fps, cfg.fps_lcm, 1.0)
    amps = jnp.ones((cfg.stop_scale + 2,))
    x = jnp.zeros((1, t0, h0, w0, 3))
    out, _ = g_apply(cfg, p, s, video=x, amps=amps, key=jax.random.PRNGKey(2),
                     train=True)
    t1, h1, w1 = scale_size_3d(1, cfg.scale_factor, cfg.stop_scale, cfg.img_size,
                               cfg.stop_scale_time, cfg.sampling_rates,
                               cfg.org_fps, cfg.fps_lcm, 1.0)
    assert out[0].shape == (1, t1, h1, w1, 3)
    d_init, d_apply = models.get_discriminator("WDiscriminator3D", 3)
    dp, ds = d_init(cfg, jax.random.PRNGKey(3))
    y, _ = d_apply(cfg, dp, ds, out[0])
    assert y.shape == (1, t1, h1, w1, 1)


@pytest.mark.parametrize("name", ["GeneratorCSG", "GeneratorSG"])
def test_baseline_generators_shapes(name):
    cfg = tiny_cfg()
    g_init, g_apply = models.get_generator(name, 3)
    p, s = g_init(cfg, jax.random.PRNGKey(0))
    grow = networks_3d.generator_csg_next_stage if name == "GeneratorCSG" \
        else networks_3d.generator_sg_next_stage
    p, s = grow(cfg, p, s)
    t0, h0, w0 = scale_size_3d(0, cfg.scale_factor, cfg.stop_scale, cfg.img_size,
                               cfg.stop_scale_time, cfg.sampling_rates,
                               cfg.org_fps, cfg.fps_lcm, 1.0)
    amps = jnp.ones((cfg.stop_scale + 2,))
    z = jnp.zeros((1, t0, h0, w0, 3))
    for rand in (False, True):
        out, _ = g_apply(cfg, p, s, noise_init=z, amps=amps,
                         key=jax.random.PRNGKey(1), is_random=rand, train=True)
        t1, h1, w1 = scale_size_3d(1, cfg.scale_factor, cfg.stop_scale,
                                   cfg.img_size, cfg.stop_scale_time,
                                   cfg.sampling_rates, cfg.org_fps, cfg.fps_lcm,
                                   1.0)
        assert out[0].shape == (1, t1, h1, w1, 3)
