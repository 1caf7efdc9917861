"""Torch-checkpoint conversion tests: synthesize a state_dict with the
original hp-vae-gan key naming (the same names the reference's pt2ms.py
regexes target) and check the converted pytree runs through our forward."""

import jax
import jax.numpy as jnp
import numpy as np

from hpvaegan_tpu import models
from hpvaegan_tpu.config import Config
from hpvaegan_tpu.tools.convert import (load_intermediate, p2j_HPVAEGAN,
                                        p2j_WDiscriminator)
from hpvaegan_tpu.utils.pyramid import scale_size_2d


def _cfg():
    cfg = Config(nfc=8, latent_dim=8, num_layer=1, enc_blocks=1, img_size=24,
                 min_size=12, max_size=24, vae_levels=1).finalize()
    cfg.ar = 1.0
    return cfg


def _fake_torch_netG(cfg, n_stages=2, seed=0):
    rng = np.random.RandomState(seed)
    sd = {}

    def conv(prefix, cin, cout, k=3, sn=False, bn=False):
        sd[f"{prefix}.conv.weight_orig" if sn else f"{prefix}.conv.weight"] = \
            rng.randn(cout, cin, k, k).astype(np.float32) * 0.05
        sd[f"{prefix}.conv.bias"] = np.zeros(cout, np.float32)
        if sn:
            sd[f"{prefix}.conv.weight_u"] = rng.randn(cout).astype(np.float32)
            sd[f"{prefix}.conv.weight_v"] = rng.randn(cin * k * k).astype(
                np.float32)
        if bn:
            sd[f"{prefix}.norm.weight"] = np.ones(cout, np.float32)
            sd[f"{prefix}.norm.bias"] = np.zeros(cout, np.float32)
            sd[f"{prefix}.norm.running_mean"] = np.zeros(cout, np.float32)
            sd[f"{prefix}.norm.running_var"] = np.ones(cout, np.float32)
            sd[f"{prefix}.norm.num_batches_tracked"] = np.int64(0)

    n = cfg.nfc
    # encoder: enc_blocks=1 -> features has 2 SN blocks (first + last)
    conv("encode.features.conv_block_0", cfg.nc_im, n, sn=True)
    conv("encode.features.conv_block_1", n, n, sn=True)
    sd["encode.mu.conv.weight"] = rng.randn(cfg.latent_dim, n, 3, 3).astype(
        np.float32) * 0.05
    sd["encode.mu.conv.bias"] = np.zeros(cfg.latent_dim, np.float32)
    sd["encode.logvar.conv.weight"] = rng.randn(cfg.latent_dim, n, 3, 3
                                                ).astype(np.float32) * 0.05
    sd["encode.logvar.conv.bias"] = np.zeros(cfg.latent_dim, np.float32)

    def stack(prefix, cin):
        conv(f"{prefix}.head", cin, n, bn=True)
        for i in range(cfg.num_layer):
            conv(f"{prefix}.block{i}", n, n, bn=True)
        sd[f"{prefix}.tail.weight"] = rng.randn(cfg.nc_im, n, 3, 3).astype(
            np.float32) * 0.05
        sd[f"{prefix}.tail.bias"] = np.zeros(cfg.nc_im, np.float32)

    stack("decoder", cfg.latent_dim)
    for k in range(n_stages):
        stack(f"body.{k}", cfg.nc_im)
    return {"state_dict": sd, "noise_amps": [1.0, 0.1, 0.05], "scale": 2}


def test_p2j_generator_runs():
    cfg = _cfg()
    ckpt = _fake_torch_netG(cfg, n_stages=2)
    params, state = p2j_HPVAEGAN(ckpt, ndim=2)
    assert len(params["body"]) == 2
    assert len(params["encode"]["features"]) == 2
    # shapes: HWIO
    assert params["decoder"]["blocks"][0]["conv"]["w"].shape == \
        (3, 3, cfg.latent_dim, cfg.nfc)

    _, g_apply = models.get_generator("GeneratorHPVAEGAN", 2)
    h0, w0 = scale_size_2d(0, cfg.scale_factor, cfg.stop_scale, cfg.img_size,
                           1.0)
    x = jnp.zeros((1, h0, w0, 3))
    amps = jnp.ones((cfg.stop_scale + 2,))
    out, _ = g_apply(cfg, params, state, video=x, amps=amps,
                     key=jax.random.PRNGKey(0), train=True)
    assert np.isfinite(np.asarray(out[0])).all()
    inter = load_intermediate(ckpt)
    assert inter == {"noise_amps": [1.0, 0.1, 0.05], "scale_idx": 2}


def test_p2j_discriminator_runs():
    cfg = _cfg()
    rng = np.random.RandomState(1)
    n = cfg.nfc
    sd = {}

    def snconv(prefix, cin, cout):
        sd[f"{prefix}.conv.weight_orig"] = rng.randn(cout, cin, 3, 3).astype(
            np.float32) * 0.05
        sd[f"{prefix}.conv.bias"] = np.zeros(cout, np.float32)
        sd[f"{prefix}.conv.weight_u"] = rng.randn(cout).astype(np.float32)
        sd[f"{prefix}.conv.weight_v"] = rng.randn(cin * 9).astype(np.float32)

    snconv("head", cfg.nc_im, n)
    for i in range(cfg.num_layer):
        snconv(f"body.block{i}", n, n)
    sd["tail.weight"] = rng.randn(1, n, 3, 3).astype(np.float32) * 0.05
    sd["tail.bias"] = np.zeros(1, np.float32)

    params, state = p2j_WDiscriminator({"state_dict": sd}, ndim=2)
    _, d_apply = models.get_discriminator("WDiscriminator2D", 2)
    y, _ = d_apply(cfg, params, state, jnp.zeros((1, 16, 16, 3)))
    assert y.shape == (1, 16, 16, 1)
    assert np.isfinite(np.asarray(y)).all()


def test_sn_v_permutation_preserves_sigma():
    # sigma computed with the permuted v must match torch's flattening
    from hpvaegan_tpu.tools.convert import _conv_w, _sn_v_perm
    rng = np.random.RandomState(3)
    w = rng.randn(4, 5, 3, 3).astype(np.float32)  # OIHW
    v_t = rng.randn(5 * 9).astype(np.float32)
    u = rng.randn(4).astype(np.float32)
    sigma_torch = u @ w.reshape(4, -1) @ v_t
    w_j = _conv_w(w, 2)  # HWIO
    v_j = _sn_v_perm(v_t, w, 2)
    sigma_jax = u @ w_j.reshape(-1, 4).T @ v_j
    np.testing.assert_allclose(sigma_torch, sigma_jax, rtol=1e-5)
