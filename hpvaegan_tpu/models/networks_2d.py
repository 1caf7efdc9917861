"""2D networks: VAE encoders, WGAN discriminator, hierarchical generator.

Functional re-design of reference src/modules/networks_2d.py:85-378:
params/state are explicit pytrees, PRNG keys are explicit, and the "growing
network" (init_next_stage deep-copy, networks_2d.py:224-235) is appending a
stage params/state pair to the `body` list. Arrays are channels-last (B,H,W,C).

Forward modes (reference construct, networks_2d.py:237-264):
  * reconstruction (noise_init=None): z ~ reparam(mu, logvar) in train,
    z ~ N(0,1) of mu.shape otherwise
  * random (noise_init given): z = noise_init, per-stage noise added
Returns (x, vae_out, mu, logvar), new_state   (mu/logvar None in random mode).
"""

from __future__ import annotations

import copy
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.conv import conv2d_init, conv2d_apply
from ..ops.resize import upscale_2d
from ..utils.noise import generate_noise
from . import blocks as B


# ---------------------------------------------------------------- encoders ---

def encode2dvae_init(cfg, key, out_dim: Optional[int] = None,
                     num_blocks: int = 2) -> Tuple[Dict, Dict]:
    """Encode2DVAE (networks_2d.py:85-107): SN feature stack + mu/logvar convs."""
    out_dim = out_dim or cfg.nfc
    kf, km, kl = jax.random.split(key, 3)
    fp, fs = B.feature_extractor_init(kf, cfg.nc_im, cfg.nfc, cfg.ker_size, 2,
                                      num_blocks=num_blocks)
    mu = conv2d_init(km, cfg.nfc, out_dim, cfg.ker_size)
    logvar = conv2d_init(kl, cfg.nfc, out_dim, cfg.ker_size)
    return ({"features": fp, "mu": mu, "logvar": logvar}, {"features": fs})


def encode2dvae_apply(cfg, params, state, x, compute_dtype=None):
    feats, fs = B.feature_extractor_apply(params["features"], state["features"],
                                          x, ker=cfg.ker_size, ndim=2,
                                          compute_dtype=compute_dtype)
    pad = cfg.ker_size // 2
    mu = conv2d_apply(params["mu"], feats, padding=pad, compute_dtype=compute_dtype)
    logvar = conv2d_apply(params["logvar"], feats, padding=pad,
                          compute_dtype=compute_dtype)
    # latents/KL stay f32 even when activations flow in bf16
    return (mu.astype(jnp.float32), logvar.astype(jnp.float32)), {"features": fs}


def encode2dvae_nb_init(cfg, key, out_dim: Optional[int] = None,
                        num_blocks: int = 2) -> Tuple[Dict, Dict]:
    """Encode2DVAE_nb (networks_2d.py:110-137): adds a Bernoulli gate and
    global average pooling of mu/logvar."""
    out_dim = out_dim or cfg.nfc
    kf, km, kl, kb = jax.random.split(key, 4)
    fp, fs = B.feature_extractor_init(kf, cfg.nc_im, cfg.nfc, cfg.ker_size, 2,
                                      num_blocks=num_blocks)
    return ({"features": fp,
             "mu": conv2d_init(km, cfg.nfc, out_dim, cfg.ker_size),
             "logvar": conv2d_init(kl, cfg.nfc, out_dim, cfg.ker_size),
             "bern": conv2d_init(kb, cfg.nfc, 1, cfg.ker_size)},
            {"features": fs})


def encode2dvae_nb_apply(cfg, params, state, x, compute_dtype=None):
    feats, fs = B.feature_extractor_apply(params["features"], state["features"],
                                          x, ker=cfg.ker_size, ndim=2,
                                          compute_dtype=compute_dtype)
    pad = cfg.ker_size // 2
    bern = jax.nn.sigmoid(conv2d_apply(params["bern"], feats, padding=pad,
                                       compute_dtype=compute_dtype))
    feats = bern * feats
    mu = jnp.mean(conv2d_apply(params["mu"], feats, padding=pad,
                               compute_dtype=compute_dtype), (1, 2), keepdims=True)
    logvar = jnp.mean(conv2d_apply(params["logvar"], feats, padding=pad,
                                   compute_dtype=compute_dtype), (1, 2),
                      keepdims=True)
    # latents/KL (incl. the Bernoulli gate feeding kl_bern) stay f32 under bf16
    return (mu.astype(jnp.float32), logvar.astype(jnp.float32),
            bern.astype(jnp.float32)), {"features": fs}


def encode2dvae1x1_init(cfg, key, out_dim: Optional[int] = None):
    """Encode2DVAE 1x1 variant (reference names it Encode3DVAE1x1 inside the
    2D module, networks_2d.py:140-159): 1x1 feature/mu/logvar convs."""
    out_dim = out_dim or cfg.nfc
    kf, km, kl = jax.random.split(key, 3)
    fp, fs = B.feature_extractor_init(kf, cfg.nc_im, cfg.nfc, 1, 2, num_blocks=2)
    return ({"features": fp,
             "mu": conv2d_init(km, cfg.nfc, out_dim, 1),
             "logvar": conv2d_init(kl, cfg.nfc, out_dim, 1)},
            {"features": fs})


def encode2dvae1x1_apply(cfg, params, state, x, compute_dtype=None):
    feats, fs = B.feature_extractor_apply(params["features"], state["features"],
                                          x, ker=1, ndim=2,
                                          compute_dtype=compute_dtype)
    mu = conv2d_apply(params["mu"], feats, padding=0, compute_dtype=compute_dtype)
    logvar = conv2d_apply(params["logvar"], feats, padding=0,
                          compute_dtype=compute_dtype)
    return (mu.astype(jnp.float32), logvar.astype(jnp.float32)), {"features": fs}


# ----------------------------------------------------------- discriminator ---

def wdiscriminator2d_init(cfg, key) -> Tuple[Dict, Dict]:
    """WDiscriminator2D (networks_2d.py:162-185): SN head + num_layer SN body
    blocks + plain conv tail (tail padding hardcoded 1, :178)."""
    n = int(cfg.nfc)
    keys = jax.random.split(key, cfg.num_layer + 2)
    head_p, head_s = B.sn_block_init(keys[0], cfg.nc_im, n, cfg.ker_size, 2)
    body_p, body_s = [], []
    for i in range(cfg.num_layer):
        p, s = B.sn_block_init(keys[1 + i], n, n, cfg.ker_size, 2)
        body_p.append(p), body_s.append(s)
    tail = conv2d_init(keys[-1], n, 1, cfg.ker_size)
    return ({"head": head_p, "body": body_p, "tail": tail},
            {"head": head_s, "body": body_s})


def wdiscriminator2d_apply(cfg, params, state, x, compute_dtype=None):
    pad = cfg.ker_size // 2
    y, hs = B.sn_block_apply(params["head"], state["head"], x, padding=pad,
                             ndim=2, compute_dtype=compute_dtype)
    bs = []
    for p, s in zip(params["body"], state["body"]):
        y, ns = B.sn_block_apply(p, s, y, padding=pad, ndim=2,
                                 compute_dtype=compute_dtype)
        bs.append(ns)
    y = conv2d_apply(params["tail"], y, padding=1, compute_dtype=compute_dtype)
    return y, {"head": hs, "body": bs}


# --------------------------------------------------------------- generator ---

def _stage_init(cfg, key, cin: int) -> Tuple[Dict, Dict]:
    return B.conv_stack_init(key, cin, int(cfg.nfc), cfg.nc_im, cfg.ker_size,
                             cfg.num_layer, ndim=2)


def generator_hpvaegan_init(cfg, key) -> Tuple[Dict, Dict]:
    ke, kd = jax.random.split(key)
    enc_p, enc_s = encode2dvae_init(cfg, ke, out_dim=cfg.latent_dim,
                                    num_blocks=cfg.enc_blocks)
    dec_p, dec_s = B.conv_stack_init(kd, cfg.latent_dim, int(cfg.nfc), cfg.nc_im,
                                     cfg.ker_size, cfg.num_layer, ndim=2)
    return ({"encode": enc_p, "decoder": dec_p, "body": []},
            {"encode": enc_s, "decoder": dec_s, "body": []})


def generator_init_next_stage(cfg, params: Dict, state: Dict, key
                              ) -> Tuple[Dict, Dict]:
    """Grow the refinement body by one stage (networks_2d.py:224-235).

    First stage is freshly initialized; later stages deep-copy the previous
    one. (GeneratorVAE_nb's reference init appends a shared REFERENCE to the
    previous stage, networks_2d.py:324 — an init bug fixed here by always
    copying; weight tying is deliberately not replicated.)
    """
    params, state = dict(params), dict(state)
    if len(params["body"]) == 0:
        sp, ss = _stage_init(cfg, key, cfg.nc_im)
    else:
        sp = copy.deepcopy(params["body"][-1])
        ss = copy.deepcopy(state["body"][-1])
    params["body"] = list(params["body"]) + [sp]
    state["body"] = list(state["body"]) + [ss]
    return params, state


def refinement_layers(cfg, body_params: List, body_state: List, x, amps,
                      key, *, start_idx: int = 0, is_random: bool,
                      train: bool, compute_dtype=None, bn_groups: int = 1,
                      noise_mask=None, train_all_escape: bool = True):
    """Residual refinement chain (networks_2d.py:266-282).

    amps: (stop_scale+1,) array of per-scale noise amplitudes (the reference
    passes a host list; an array avoids recompiles when amps change).
    train_all_escape: GeneratorHPVAEGAN's VAE-boundary stop_gradient is
    skipped under --train-all (networks_2d.py:269); GeneratorVAE_nb's is
    UNCONDITIONAL (networks_2d.py:366) — it passes False.
    """
    # no-grad sampling fast path: one fused Pallas kernel for
    # upscale+noise (ops/pallas/upsample_noise.py); not used under grad
    # (no VJP), in reconstruction mode, or under a paired-forward noise
    # mask (the kernel adds UNMASKED noise — it would corrupt the recon half)
    use_pallas = bool(getattr(cfg, "pallas_fused_sampling", False)) \
        and is_random and not train and noise_mask is None
    if use_pallas:
        from ..ops.pallas.upsample_noise import fused_upscale_noise_2d
        from ..utils.pyramid import scale_size_2d

    new_states = list(body_state[:start_idx])
    for idx in range(start_idx, len(body_params)):
        block_p, block_s = body_params[idx], body_state[idx]
        if cfg.vae_levels == idx + 1 \
                and not (cfg.train_all and train_all_escape):
            x = jax.lax.stop_gradient(x)
        if use_pallas:
            key, sub = jax.random.split(key)
            seed = jax.random.randint(sub, (), 0, 2 ** 31 - 1)
            hw = scale_size_2d(idx + 1, cfg.scale_factor, cfg.stop_scale,
                               cfg.img_size, cfg.ar)
            x_up, x_in = fused_upscale_noise_2d(x.astype(jnp.float32), hw,
                                                amps[idx + 1], seed)
        else:
            x_up = upscale_2d(x, idx + 1, cfg.scale_factor, cfg.stop_scale,
                              cfg.img_size, cfg.ar)
            if is_random:
                key, sub = jax.random.split(key)
                noise = generate_noise(sub, x_up.shape)
                if noise_mask is not None:  # paired fwd: fake rows only
                    noise = noise * noise_mask
                x_in = x_up + (noise * amps[idx + 1]).astype(x_up.dtype)
            else:
                x_in = x_up
        y, ns = B.conv_stack_apply(block_p, block_s, x_in, ker=cfg.ker_size,
                                   padd=cfg.padd_size, train=train, ndim=2,
                                   compute_dtype=compute_dtype,
                                   bn_groups=bn_groups)
        new_states.append(ns)
        x = jnp.tanh(y + x_up)
    return x, new_states


def generator_hpvaegan_apply(cfg, params, state, *, video=None, amps,
                             noise_init=None, sample_init=None, key,
                             is_random: bool = False, train: bool = False,
                             compute_dtype=None):
    """GeneratorHPVAEGAN forward (networks_2d.py:237-264)."""
    kz, kr = jax.random.split(key)
    mu = logvar = None
    new_state = dict(state)
    if noise_init is None:
        (mu, logvar), enc_s = encode2dvae_apply(cfg, params["encode"],
                                                state["encode"], video,
                                                compute_dtype)
        new_state["encode"] = enc_s
        if train:
            std = jnp.exp(logvar * 0.5)
            eps = generate_noise(kz, std.shape)
            z_vae = eps * std + mu
        else:
            z_vae = generate_noise(kz, mu.shape)
    else:
        z_vae = noise_init

    dec_out, dec_s = B.conv_stack_apply(params["decoder"], state["decoder"],
                                        z_vae, ker=cfg.ker_size,
                                        padd=cfg.padd_size, train=train, ndim=2,
                                        compute_dtype=compute_dtype)
    new_state["decoder"] = dec_s
    vae_out = jnp.tanh(dec_out)

    if sample_init is not None:
        start_idx, x0 = sample_init
        assert len(params["body"]) > start_idx, \
            "sample_init start beyond body length (networks_2d.py:239-240)"
    else:
        start_idx, x0 = 0, vae_out

    x, body_s = refinement_layers(cfg, params["body"], state["body"], x0, amps,
                                  kr, start_idx=start_idx, is_random=is_random,
                                  train=train, compute_dtype=compute_dtype)
    new_state["body"] = body_s
    return (x, vae_out, mu, logvar), new_state


def generator_hpvaegan_apply_pair(cfg, params, state, *, video, amps,
                                  noise_init, key, train: bool = True,
                                  compute_dtype=None):
    """Reconstruction + random-mode fake in ONE width-2B forward.

    The unfused GAN-phase G step runs the generator twice (reconstruction on
    `video`, fake on `noise_init` — steps._g_step_core); here the decoder +
    refinement chain runs once on the stacked batch. Exact vs the two
    separate forwards: batchnorm uses per-half statistics with sequential
    moving-stat folding (ops/norm.py groups=2 — recon half first, matching
    the gs1->gs2 threading), and refinement noise is masked to the fake
    half. Returns ((gen, fake, vae_out, mu, logvar), new_state).
    """
    kz, kr = jax.random.split(key)
    new_state = dict(state)
    (mu, logvar), enc_s = encode2dvae_apply(cfg, params["encode"],
                                            state["encode"], video,
                                            compute_dtype)
    new_state["encode"] = enc_s
    if train:
        std = jnp.exp(logvar * 0.5)
        eps = generate_noise(kz, std.shape)
        z_vae = eps * std + mu
    else:
        z_vae = generate_noise(kz, mu.shape)
    b = z_vae.shape[0]
    # grouped BN (bn_groups=2) splits the stacked batch into EQUAL halves;
    # an unequal fake batch would silently mix recon and fake rows in one
    # BN group while the noise mask uses the true boundary
    assert noise_init.shape[0] == b, \
        (noise_init.shape[0], b, "paired forward needs equal batches")
    z_all = jnp.concatenate([z_vae, noise_init.astype(z_vae.dtype)], axis=0)

    dec_out, dec_s = B.conv_stack_apply(params["decoder"], state["decoder"],
                                        z_all, ker=cfg.ker_size,
                                        padd=cfg.padd_size, train=train,
                                        ndim=2, compute_dtype=compute_dtype,
                                        bn_groups=2)
    new_state["decoder"] = dec_s
    vae_all = jnp.tanh(dec_out)

    mask = jnp.concatenate([jnp.zeros((b,)), jnp.ones((noise_init.shape[0],))])
    mask = mask.reshape((-1,) + (1,) * (vae_all.ndim - 1))
    x, body_s = refinement_layers(cfg, params["body"], state["body"], vae_all,
                                  amps, kr, start_idx=0, is_random=True,
                                  train=train, compute_dtype=compute_dtype,
                                  bn_groups=2, noise_mask=mask)
    new_state["body"] = body_s
    return (x[:b], x[b:], vae_all[:b], mu, logvar), new_state


# ------------------------------------------------- GeneratorVAE_nb variant ---

def generator_vae_nb_init(cfg, key) -> Tuple[Dict, Dict]:
    ke, kd = jax.random.split(key)
    enc_p, enc_s = encode2dvae_nb_init(cfg, ke, out_dim=cfg.latent_dim,
                                       num_blocks=cfg.enc_blocks)
    dec_p, dec_s = B.conv_stack_init(kd, cfg.latent_dim, int(cfg.nfc), cfg.nc_im,
                                     cfg.ker_size, cfg.num_layer, ndim=2)
    return ({"encode": enc_p, "decoder": dec_p, "body": []},
            {"encode": enc_s, "decoder": dec_s, "body": []})


def generator_vae_nb_apply(cfg, params, state, *, video=None, amps,
                           noise_init=None, noise_init_bern=None,
                           sample_init=None, key, is_random: bool = False,
                           train: bool = False, compute_dtype=None):
    """GeneratorVAE_nb forward (networks_2d.py:326-360): Gaussian + Bernoulli
    (Gumbel relaxation) latents multiplied into the decoder input."""
    kz, kb, kr = jax.random.split(key, 3)
    mu = logvar = bern = None
    new_state = dict(state)
    if noise_init is None:
        (mu, logvar, bern), enc_s = encode2dvae_nb_apply(
            cfg, params["encode"], state["encode"], video, compute_dtype)
        new_state["encode"] = enc_s
        if train:
            std = jnp.exp(logvar * 0.5)
            z_norm = generate_noise(kz, std.shape) * std + mu
            eps = generate_noise(kb, bern.shape, kind="uniform")
            z_bern = jnp.log(bern + 1e-20) - jnp.log(-jnp.log(eps + 1e-20) + 1e-20)
        else:
            z_norm = generate_noise(kz, mu.shape)
            z_bern = generate_noise(kb, bern.shape, kind="bernoulli")
    else:
        z_norm = noise_init
        # drivers pass only the Gaussian noise (the reference crashes here,
        # GWithLoss/DWithLoss never supply noise_init_bern); default to a
        # Bernoulli(0.5) gate sample
        z_bern = noise_init_bern if noise_init_bern is not None else \
            generate_noise(kb, z_norm.shape[:-1] + (1,), kind="bernoulli")

    dec_out, dec_s = B.conv_stack_apply(params["decoder"], state["decoder"],
                                        z_norm * z_bern, ker=cfg.ker_size,
                                        padd=cfg.padd_size, train=train, ndim=2,
                                        compute_dtype=compute_dtype)
    new_state["decoder"] = dec_s
    vae_out = jnp.tanh(dec_out)

    if sample_init is not None:
        start_idx, x0 = sample_init
    else:
        start_idx, x0 = 0, vae_out

    x, body_s = refinement_layers(cfg, params["body"], state["body"], x0, amps,
                                  kr, start_idx=start_idx, is_random=is_random,
                                  train=train, compute_dtype=compute_dtype,
                                  train_all_escape=False)
    new_state["body"] = body_s
    return (x, vae_out, mu, logvar, bern), new_state
