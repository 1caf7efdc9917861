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


def test_generator_pair_matches_separate_forwards():
    """generator_hpvaegan_apply_pair must reproduce the two separate
    forwards bit-for-bit when refinement noise is off (amps=0): per-half BN
    statistics + sequential moving-stat folding (recon half first)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hpvaegan_tpu import models
    from hpvaegan_tpu.config import Config
    from hpvaegan_tpu.models.networks_2d import (
        generator_hpvaegan_apply_pair, generator_init_next_stage)

    cfg = Config(nfc=8, latent_dim=8, num_layer=1, enc_blocks=1, img_size=24,
                 min_size=12, max_size=24, vae_levels=1).finalize()
    cfg.ar = 1.0
    g_init, g_apply = models.get_generator("GeneratorHPVAEGAN", 2)
    p, s = g_init(cfg, jax.random.PRNGKey(0))
    for i in range(2):
        p, s = generator_init_next_stage(cfg, p, s, jax.random.PRNGKey(i))

    k = jax.random.PRNGKey(7)
    video = jax.random.normal(jax.random.PRNGKey(1), (2, 13, 13, 3))
    noise = jax.random.normal(jax.random.PRNGKey(2), (2, 13, 13, 8))
    amps = jnp.zeros((cfg.stop_scale + 2,))  # noise off -> exact comparison

    # separate: recon (key k, state s) then fake (state gs1), the unfused
    # g_step threading
    out1, gs1 = g_apply(cfg, p, s, video=video, amps=amps, noise_init=None,
                        key=k, is_random=False, train=True)
    out2, gs2 = g_apply(cfg, p, gs1, video=None, amps=amps, noise_init=noise,
                        key=k, is_random=True, train=True)

    (gen, fake, gen_vae, mu, logvar), gsp = generator_hpvaegan_apply_pair(
        cfg, p, s, video=video, amps=amps, noise_init=noise, key=k, train=True)

    np.testing.assert_allclose(np.asarray(gen), np.asarray(out1[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fake), np.asarray(out2[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gen_vae), np.asarray(out1[1]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(out1[2]),
                               rtol=1e-6, atol=1e-6)
    # moving BN stats: pair folding == sequential recon->fake threading
    flat_a = jax.tree_util.tree_leaves(gs2)
    flat_b = jax.tree_util.tree_leaves(gsp)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_grouped_batchnorm_matches_separate():
    """batchnorm groups=2 == two separate width-B applications."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hpvaegan_tpu.ops.norm import batchnorm_apply, batchnorm_init

    p, s = batchnorm_init(jax.random.PRNGKey(0), 5)
    a = jax.random.normal(jax.random.PRNGKey(1), (3, 6, 6, 5))
    b = jax.random.normal(jax.random.PRNGKey(2), (3, 6, 6, 5)) * 2 + 1

    ya, s1 = batchnorm_apply(p, s, a, train=True)
    yb, s2 = batchnorm_apply(p, s1, b, train=True)
    yg, sg = batchnorm_apply(p, s, jnp.concatenate([a, b]), train=True,
                             groups=2)
    np.testing.assert_allclose(np.asarray(yg[:3]), np.asarray(ya),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(yg[3:]), np.asarray(yb),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sg["mean"]), np.asarray(s2["mean"]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sg["var"]), np.asarray(s2["var"]),
                               rtol=1e-6, atol=1e-6)


def test_bf16_latents_stay_f32_all_encoder_variants():
    """Under --compute-dtype bfloat16, mu/logvar (and the Bernoulli gate
    feeding kl_bern) must be f32 for EVERY encoder variant — the documented
    invariant 'latents/KL stay f32'. Covers the nb encoders and the 3D 1x1
    variant that previously leaked bf16 latents."""
    from hpvaegan_tpu import losses
    from hpvaegan_tpu.models import networks_2d, networks_3d

    f32 = jnp.float32
    bf16 = jnp.bfloat16
    cfg = tiny_cfg(generator="GeneratorVAE_nb")

    # 2D nb, through the full GeneratorVAE_nb forward
    g_init, g_apply = models.get_generator("GeneratorVAE_nb", 2)
    p, s = g_init(cfg, jax.random.PRNGKey(0))
    amps = jnp.ones((cfg.stop_scale + 2,))
    h0, w0 = scale_size_2d(0, cfg.scale_factor, cfg.stop_scale, cfg.img_size, 1.0)
    x = jnp.ones((1, h0, w0, 3), f32)
    (out, vae_out, mu, logvar, bern), _ = g_apply(
        cfg, p, s, video=x, amps=amps, key=jax.random.PRNGKey(1), train=True,
        compute_dtype=bf16)
    assert mu.dtype == f32 and logvar.dtype == f32 and bern.dtype == f32
    assert losses.kl_criterion(mu, logvar).dtype == f32
    assert losses.kl_bern_criterion(bern).dtype == f32

    # 3D nb + 3D 1x1 + plain encoders, direct apply
    cfg3 = tiny_cfg()
    xv = jnp.ones((1, 4, h0, w0, 3), f32)
    p3, s3 = networks_3d.encode3dvae_nb_init(cfg3, jax.random.PRNGKey(2),
                                             out_dim=cfg3.latent_dim,
                                             num_blocks=1)
    (mu3, lv3, b3), _ = networks_3d.encode3dvae_nb_apply(
        cfg3, p3, s3, xv, compute_dtype=bf16)
    assert mu3.dtype == f32 and lv3.dtype == f32 and b3.dtype == f32

    p1, s1 = networks_3d.encode3dvae1x1_init(cfg3, jax.random.PRNGKey(3),
                                             out_dim=cfg3.latent_dim)
    (mu1, lv1), _ = networks_3d.encode3dvae1x1_apply(cfg3, p1, s1, xv,
                                                     compute_dtype=bf16)
    assert mu1.dtype == f32 and lv1.dtype == f32

    pe, se = networks_2d.encode2dvae_init(cfg, jax.random.PRNGKey(4),
                                          out_dim=cfg.latent_dim, num_blocks=1)
    (mue, lve), _ = networks_2d.encode2dvae_apply(cfg, pe, se, x,
                                                  compute_dtype=bf16)
    assert mue.dtype == f32 and lve.dtype == f32


def test_vae_nb_stop_gradient_unconditional_under_train_all():
    """Reference parity: GeneratorHPVAEGAN skips the VAE-boundary
    stop_gradient under --train-all (networks_2d.py:269) but GeneratorVAE_nb
    stops UNCONDITIONALLY (networks_2d.py:366) — gradients from the
    refinement output must never reach VAE_nb's decoder, train_all or not."""
    def decoder_grad_norm(name, train_all):
        cfg = tiny_cfg(vae_levels=1)
        cfg.train_all = train_all
        g_init, g_apply = models.get_generator(name, 2)
        p, s = g_init(cfg, jax.random.PRNGKey(0))
        from hpvaegan_tpu.models.networks_2d import generator_init_next_stage
        p, s = generator_init_next_stage(cfg, p, s, jax.random.PRNGKey(1))
        amps = jnp.ones((cfg.stop_scale + 2,))
        h0, w0 = scale_size_2d(0, cfg.scale_factor, cfg.stop_scale,
                               cfg.img_size, 1.0)
        video = jnp.ones((1, h0, w0, 3)) * 0.1

        def loss(dec):
            out, _ = g_apply(cfg, {**p, "decoder": dec}, s, video=video,
                             amps=amps, key=jax.random.PRNGKey(2), train=True)
            return jnp.sum(out[0] ** 2)  # refinement output ONLY

        g = jax.grad(loss)(p["decoder"])
        return sum(float(jnp.sum(jnp.abs(l)))
                   for l in jax.tree_util.tree_leaves(g))

    # boundary stop always cuts the refinement path without train_all
    assert decoder_grad_norm("GeneratorHPVAEGAN", False) == 0.0
    assert decoder_grad_norm("GeneratorVAE_nb", False) == 0.0
    # --train-all: HPVAEGAN lets gradients through, VAE_nb must NOT
    assert decoder_grad_norm("GeneratorHPVAEGAN", True) > 0.0
    assert decoder_grad_norm("GeneratorVAE_nb", True) == 0.0


def test_pair_forward_rejects_unequal_batches():
    """Grouped BN splits the stacked batch into equal halves; an unequal
    fake batch would silently mix recon/fake rows in one BN group."""
    cfg = tiny_cfg()
    g_init, _ = models.get_generator("GeneratorHPVAEGAN", 2)
    pair = models.get_generator_pair("GeneratorHPVAEGAN", 2)
    p, s = g_init(cfg, jax.random.PRNGKey(0))
    h0, w0 = scale_size_2d(0, cfg.scale_factor, cfg.stop_scale, cfg.img_size,
                           1.0)
    video = jnp.zeros((2, h0, w0, 3))
    noise = jnp.zeros((6, h0, w0, cfg.latent_dim))
    amps = jnp.ones((cfg.stop_scale + 2,))
    with pytest.raises(AssertionError):
        pair(cfg, p, s, video=video, amps=amps, noise_init=noise,
             key=jax.random.PRNGKey(1), train=True)


def test_generator_sg_tail_has_no_bias():
    """Reference SG stage tail omits has_bias (MindSpore default False,
    networks_3d.py:324-325); CSG's tail keeps its explicit has_bias=True."""
    cfg = tiny_cfg(video_path="x")
    sg_p, _ = models.get_generator("GeneratorSG", 3)[0](cfg,
                                                        jax.random.PRNGKey(0))
    assert "b" not in sg_p["body"][0]["tail"]
    csg_p, _ = models.get_generator("GeneratorCSG", 3)[0](cfg,
                                                          jax.random.PRNGKey(0))
    assert "b" in csg_p["tail"]


def test_interp_matrix_matches_gather():
    """_interp_matrix is derived from _interp_gather; the two forms must be
    bit-identical (gather feeds model/data resizes, matrix feeds the Pallas
    kernel)."""
    from hpvaegan_tpu.ops.resize import _interp_gather, _interp_matrix

    for n_in, n_out in [(1, 5), (5, 1), (7, 13), (13, 7), (4, 4)]:
        for ac in (True, False):
            w = _interp_matrix(n_in, n_out, ac)
            lo, hi, frac = _interp_gather(n_in, n_out, ac)
            x = np.random.RandomState(0).randn(n_in).astype(np.float32)
            via_gather = x[lo] * (1 - frac) + x[hi] * frac
            np.testing.assert_allclose(w @ x, via_gather, rtol=1e-6)
            np.testing.assert_allclose(w.sum(axis=1), 1.0, rtol=1e-6)
