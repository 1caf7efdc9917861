"""3D networks: video VAE encoders, WGAN discriminators, hierarchical
generator, and the SinGAN-style baselines (CSG/SG).

Functional re-design of reference src/modules/networks_3d.py:89-551.
Arrays are channels-last (B, T, H, W, C); time-depth grows with the pyramid
via trilinear upscale (networks_3d.py:440-441).

Reference bugs fixed here (SURVEY §7):
  * GeneratorSG references an unset `self.opt` (networks_3d.py:311-313) and
    never carries the residual inside its loop (:329-350) — fixed with a
    proper residual carry.
  * GeneratorCSG's zero-pad of num_layer per side (:246-249) under-pads its
    (num_layer+1)-conv stages by 1, which cannot shape-check; the pad here is
    num_layer+1 (shape-consistent; the reference baselines driver is broken
    as shipped, train_video_baselines.py:340).
"""

from __future__ import annotations

import copy
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.conv import conv3d_init, conv3d_apply
from ..ops.resize import resize_trilinear, upscale_3d
from ..utils.noise import generate_noise
from . import blocks as B


def _upscale(cfg, x, index):
    return upscale_3d(x, index, cfg.scale_factor, cfg.stop_scale, cfg.img_size,
                      cfg.stop_scale_time, cfg.sampling_rates, cfg.org_fps,
                      cfg.fps_lcm, cfg.ar)


def _zero_pad3d(x, pad: int):
    return jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (pad, pad), (0, 0)])


# ---------------------------------------------------------------- encoders ---

def encode3dvae_init(cfg, key, out_dim: Optional[int] = None,
                     num_blocks: int = 2) -> Tuple[Dict, Dict]:
    """Encode3DVAE (networks_3d.py:89-112)."""
    out_dim = out_dim or cfg.nfc
    kf, km, kl = jax.random.split(key, 3)
    fp, fs = B.feature_extractor_init(kf, cfg.nc_im, cfg.nfc, cfg.ker_size, 3,
                                      num_blocks=num_blocks)
    return ({"features": fp,
             "mu": conv3d_init(km, cfg.nfc, out_dim, cfg.ker_size),
             "logvar": conv3d_init(kl, cfg.nfc, out_dim, cfg.ker_size)},
            {"features": fs})


def encode3dvae_apply(cfg, params, state, x, compute_dtype=None):
    feats, fs = B.feature_extractor_apply(params["features"], state["features"],
                                          x, ker=cfg.ker_size, ndim=3,
                                          compute_dtype=compute_dtype)
    pad = cfg.ker_size // 2
    mu = conv3d_apply(params["mu"], feats, padding=pad, compute_dtype=compute_dtype)
    logvar = conv3d_apply(params["logvar"], feats, padding=pad,
                          compute_dtype=compute_dtype)
    # latents/KL stay f32 even when activations flow in bf16
    return (mu.astype(jnp.float32), logvar.astype(jnp.float32)), {"features": fs}


def encode3dvae_nb_init(cfg, key, out_dim: Optional[int] = None,
                        num_blocks: int = 2) -> Tuple[Dict, Dict]:
    """Encode3DVAE_nb (networks_3d.py:115-144): Bernoulli gate + global mean."""
    out_dim = out_dim or cfg.nfc
    kf, km, kl, kb = jax.random.split(key, 4)
    fp, fs = B.feature_extractor_init(kf, cfg.nc_im, cfg.nfc, cfg.ker_size, 3,
                                      num_blocks=num_blocks)
    return ({"features": fp,
             "mu": conv3d_init(km, cfg.nfc, out_dim, cfg.ker_size),
             "logvar": conv3d_init(kl, cfg.nfc, out_dim, cfg.ker_size),
             "bern": conv3d_init(kb, cfg.nfc, 1, cfg.ker_size)},
            {"features": fs})


def encode3dvae_nb_apply(cfg, params, state, x, compute_dtype=None):
    feats, fs = B.feature_extractor_apply(params["features"], state["features"],
                                          x, ker=cfg.ker_size, ndim=3,
                                          compute_dtype=compute_dtype)
    pad = cfg.ker_size // 2
    bern = jax.nn.sigmoid(conv3d_apply(params["bern"], feats, padding=pad,
                                       compute_dtype=compute_dtype))
    feats = bern * feats
    mu = jnp.mean(conv3d_apply(params["mu"], feats, padding=pad,
                               compute_dtype=compute_dtype),
                  (1, 2, 3), keepdims=True)
    logvar = jnp.mean(conv3d_apply(params["logvar"], feats, padding=pad,
                                   compute_dtype=compute_dtype),
                      (1, 2, 3), keepdims=True)
    # latents/KL (incl. the Bernoulli gate feeding kl_bern) stay f32 under bf16
    return (mu.astype(jnp.float32), logvar.astype(jnp.float32),
            bern.astype(jnp.float32)), {"features": fs}


def encode3dvae1x1_init(cfg, key, out_dim: Optional[int] = None):
    """Encode3DVAE1x1 (networks_3d.py:147-167): 1x1x1 feature/mu/logvar convs."""
    out_dim = out_dim or cfg.nfc
    kf, km, kl = jax.random.split(key, 3)
    fp, fs = B.feature_extractor_init(kf, cfg.nc_im, cfg.nfc, 1, 3, num_blocks=2)
    return ({"features": fp,
             "mu": conv3d_init(km, cfg.nfc, out_dim, 1),
             "logvar": conv3d_init(kl, cfg.nfc, out_dim, 1)},
            {"features": fs})


def encode3dvae1x1_apply(cfg, params, state, x, compute_dtype=None):
    feats, fs = B.feature_extractor_apply(params["features"], state["features"],
                                          x, ker=1, ndim=3,
                                          compute_dtype=compute_dtype)
    mu = conv3d_apply(params["mu"], feats, padding=0, compute_dtype=compute_dtype)
    logvar = conv3d_apply(params["logvar"], feats, padding=0,
                          compute_dtype=compute_dtype)
    # latents/KL stay f32 even when activations flow in bf16
    return (mu.astype(jnp.float32), logvar.astype(jnp.float32)), {"features": fs}


# ------------------------------------------------------------ discriminators ---

def wdiscriminator3d_init(cfg, key) -> Tuple[Dict, Dict]:
    """WDiscriminator3D (networks_3d.py:170-193)."""
    n = int(cfg.nfc)
    keys = jax.random.split(key, cfg.num_layer + 2)
    head_p, head_s = B.sn_block_init(keys[0], cfg.nc_im, n, cfg.ker_size, 3)
    body_p, body_s = [], []
    for i in range(cfg.num_layer):
        p, s = B.sn_block_init(keys[1 + i], n, n, cfg.ker_size, 3)
        body_p.append(p), body_s.append(s)
    tail = conv3d_init(keys[-1], n, 1, cfg.ker_size)
    return ({"head": head_p, "body": body_p, "tail": tail},
            {"head": head_s, "body": body_s})


def wdiscriminator3d_apply(cfg, params, state, x, compute_dtype=None):
    pad = cfg.ker_size // 2
    y, hs = B.sn_block_apply(params["head"], state["head"], x, padding=pad,
                             ndim=3, compute_dtype=compute_dtype)
    bs = []
    for p, s in zip(params["body"], state["body"]):
        y, ns = B.sn_block_apply(p, s, y, padding=pad, ndim=3,
                                 compute_dtype=compute_dtype)
        bs.append(ns)
    y = conv3d_apply(params["tail"], y, padding=1, compute_dtype=compute_dtype)
    return y, {"head": hs, "body": bs}


def wdiscriminator_baselines_init(cfg, key) -> Tuple[Dict, Dict]:
    """WDiscriminatorBaselines (networks_3d.py:196-226): zero-padded input,
    plain-conv head (no BN), SN body, conv tail."""
    n = int(cfg.nfc)
    keys = jax.random.split(key, cfg.num_layer + 2)
    head_p, head_s = B.conv_block_init(keys[0], cfg.nc_im, n, cfg.ker_size, 3,
                                       bn=False)
    body_p, body_s = [], []
    for i in range(cfg.num_layer):
        p, s = B.sn_block_init(keys[1 + i], n, n, cfg.ker_size, 3)
        body_p.append(p), body_s.append(s)
    tail = conv3d_init(keys[-1], n, 1, cfg.ker_size)
    return ({"head": head_p, "body": body_p, "tail": tail},
            {"head": head_s, "body": body_s})


def wdiscriminator_baselines_apply(cfg, params, state, x, compute_dtype=None):
    x = _zero_pad3d(x, cfg.num_layer + 2)
    y, hs = B.conv_block_apply(params["head"], state["head"], x,
                               padding=cfg.padd_size, act="lrelu", train=False,
                               ndim=3, compute_dtype=compute_dtype)
    bs = []
    for p, s in zip(params["body"], state["body"]):
        y, ns = B.sn_block_apply(p, s, y, padding=cfg.ker_size // 2, ndim=3,
                                 compute_dtype=compute_dtype)
        bs.append(ns)
    y = conv3d_apply(params["tail"], y, padding=cfg.padd_size,
                     compute_dtype=compute_dtype)
    return y, {"head": hs, "body": bs}


# ------------------------------------------------------ hierarchical generator ---

def _stage_init(cfg, key, cin: int) -> Tuple[Dict, Dict]:
    return B.conv_stack_init(key, cin, int(cfg.nfc), cfg.nc_im, cfg.ker_size,
                             cfg.num_layer, ndim=3)


def generator_hpvaegan_init(cfg, key) -> Tuple[Dict, Dict]:
    ke, kd = jax.random.split(key)
    enc_p, enc_s = encode3dvae_init(cfg, ke, out_dim=cfg.latent_dim,
                                    num_blocks=cfg.enc_blocks)
    dec_p, dec_s = B.conv_stack_init(kd, cfg.latent_dim, int(cfg.nfc), cfg.nc_im,
                                     cfg.ker_size, cfg.num_layer, ndim=3)
    return ({"encode": enc_p, "decoder": dec_p, "body": []},
            {"encode": enc_s, "decoder": dec_s, "body": []})


def generator_init_next_stage(cfg, params: Dict, state: Dict, key) -> Tuple[Dict, Dict]:
    """Grow the body (networks_3d.py:393-404): fresh first stage, then deep copies."""
    params, state = dict(params), dict(state)
    if len(params["body"]) == 0:
        sp, ss = _stage_init(cfg, key, cfg.nc_im)
    else:
        sp = copy.deepcopy(params["body"][-1])
        ss = copy.deepcopy(state["body"][-1])
    params["body"] = list(params["body"]) + [sp]
    state["body"] = list(state["body"]) + [ss]
    return params, state


def refinement_layers_3d(cfg, body_params: List, body_state: List, x, amps, key,
                         *, start_idx: int = 0, is_random: bool,
                         gate_noise_on_vae_levels: bool = True, train: bool,
                         compute_dtype=None):
    """Residual refinement (networks_3d.py:434-451). Unlike 2D, noise is only
    added at stages idx+1 >= vae_levels (networks_3d.py:443) when
    `gate_noise_on_vae_levels`; GeneratorVAE_nb adds it everywhere (:534-551)."""
    new_states = list(body_state[:start_idx])
    for idx in range(start_idx, len(body_params)):
        block_p, block_s = body_params[idx], body_state[idx]
        if cfg.vae_levels == idx + 1 and not cfg.train_all:
            x = jax.lax.stop_gradient(x)
        x_up = _upscale(cfg, x, idx + 1)
        add_noise = is_random and (
            not gate_noise_on_vae_levels or cfg.vae_levels <= idx + 1)
        if add_noise:
            key, sub = jax.random.split(key)
            noise = generate_noise(sub, x_up.shape)
            x_in = x_up + (noise * amps[idx + 1]).astype(x_up.dtype)
        else:
            x_in = x_up
        y, ns = B.conv_stack_apply(block_p, block_s, x_in, ker=cfg.ker_size,
                                   padd=cfg.padd_size, train=train, ndim=3,
                                   compute_dtype=compute_dtype)
        new_states.append(ns)
        x = jnp.tanh(y + x_up)
    return x, new_states


def generator_hpvaegan_apply(cfg, params, state, *, video=None, amps,
                             noise_init=None, sample_init=None, key,
                             is_random: bool = False, train: bool = False,
                             compute_dtype=None):
    """GeneratorHPVAEGAN 3D forward (networks_3d.py:406-432)."""
    kz, kr = jax.random.split(key)
    mu = logvar = None
    new_state = dict(state)
    if noise_init is None:
        (mu, logvar), enc_s = encode3dvae_apply(cfg, params["encode"],
                                                state["encode"], video,
                                                compute_dtype)
        new_state["encode"] = enc_s
        if train:
            std = jnp.exp(logvar * 0.5)
            z_vae = generate_noise(kz, std.shape) * std + mu
        else:
            z_vae = generate_noise(kz, mu.shape)
    else:
        z_vae = noise_init

    dec_out, dec_s = B.conv_stack_apply(params["decoder"], state["decoder"],
                                        z_vae, ker=cfg.ker_size,
                                        padd=cfg.padd_size, train=train, ndim=3,
                                        compute_dtype=compute_dtype)
    new_state["decoder"] = dec_s
    vae_out = jnp.tanh(dec_out)

    if sample_init is not None:
        start_idx, x0 = sample_init
        assert len(params["body"]) > start_idx
    else:
        start_idx, x0 = 0, vae_out

    x, body_s = refinement_layers_3d(cfg, params["body"], state["body"], x0,
                                     amps, kr, start_idx=start_idx,
                                     is_random=is_random, train=train,
                                     compute_dtype=compute_dtype)
    new_state["body"] = body_s
    return (x, vae_out, mu, logvar), new_state


def generator_vae_nb_init(cfg, key) -> Tuple[Dict, Dict]:
    ke, kd = jax.random.split(key)
    enc_p, enc_s = encode3dvae_nb_init(cfg, ke, out_dim=cfg.latent_dim,
                                       num_blocks=cfg.enc_blocks)
    dec_p, dec_s = B.conv_stack_init(kd, cfg.latent_dim, int(cfg.nfc), cfg.nc_im,
                                     cfg.ker_size, cfg.num_layer, ndim=3)
    return ({"encode": enc_p, "decoder": dec_p, "body": []},
            {"encode": enc_s, "decoder": dec_s, "body": []})


def generator_vae_nb_apply(cfg, params, state, *, video=None, amps,
                           noise_init=None, noise_init_bern=None,
                           sample_init=None, key, is_random: bool = False,
                           train: bool = False, compute_dtype=None):
    """GeneratorVAE_nb 3D forward (networks_3d.py:498-532)."""
    kz, kb, kr = jax.random.split(key, 3)
    mu = logvar = bern = None
    new_state = dict(state)
    if noise_init is None:
        (mu, logvar, bern), enc_s = encode3dvae_nb_apply(
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
                                        padd=cfg.padd_size, train=train, ndim=3,
                                        compute_dtype=compute_dtype)
    new_state["decoder"] = dec_s
    vae_out = jnp.tanh(dec_out)

    if sample_init is not None:
        start_idx, x0 = sample_init
    else:
        start_idx, x0 = 0, vae_out

    x, body_s = refinement_layers_3d(cfg, params["body"], state["body"], x0,
                                     amps, kr, start_idx=start_idx,
                                     is_random=is_random,
                                     gate_noise_on_vae_levels=False,
                                     train=train, compute_dtype=compute_dtype,
                                     train_all_escape=False)
    new_state["body"] = body_s
    return (x, vae_out, mu, logvar, bern), new_state


# ------------------------------------------------------- SinGAN baselines ---

def _baseline_stage_init(cfg, key, cin: int, cout_tail: Optional[int],
                         n_blocks: int,
                         tail_bias: bool = True) -> Tuple[Dict, Dict]:
    """A stack of padding-0 ConvBlock3Ds (+ optional plain conv tail)."""
    n = int(cfg.nfc)
    keys = jax.random.split(key, n_blocks + 1)
    blocks_p, blocks_s = [], []
    p, s = B.conv_block_init(keys[0], cin, n, cfg.ker_size, 3)
    blocks_p.append(p), blocks_s.append(s)
    for i in range(n_blocks - 1):
        p, s = B.conv_block_init(keys[1 + i], n, n, cfg.ker_size, 3)
        blocks_p.append(p), blocks_s.append(s)
    params: Dict = {"blocks": blocks_p}
    state: Dict = {"blocks": blocks_s}
    if cout_tail is not None:
        params["tail"] = conv3d_init(keys[-1], n, cout_tail, cfg.ker_size,
                                     bias=tail_bias)
    return params, state


def _baseline_stage_apply(cfg, params, state, x, train, compute_dtype=None):
    new_blocks = []
    for p, s in zip(params["blocks"], state["blocks"]):
        x, ns = B.conv_block_apply(p, s, x, padding=0, train=train, ndim=3,
                                   compute_dtype=compute_dtype)
        new_blocks.append(ns)
    if "tail" in params:
        x = conv3d_apply(params["tail"], x, padding=0,
                         compute_dtype=compute_dtype)
    return x, {"blocks": new_blocks}


def generator_csg_init(cfg, key) -> Tuple[Dict, Dict]:
    """GeneratorCSG (networks_3d.py:229-291): shared head/tail + growing body
    of padding-0 conv stacks fed via explicit outer zero-pads."""
    kh, kb, kt = jax.random.split(key, 3)
    n = int(cfg.nfc)
    head_p, head_s = B.conv_block_init(kh, cfg.nc_im, n, cfg.ker_size, 3)
    stage_p, stage_s = _baseline_stage_init(cfg, kb, n, None, cfg.num_layer + 1)
    tail = conv3d_init(kt, n, cfg.nc_im, cfg.ker_size)
    return ({"head": head_p, "body": [stage_p], "tail": tail},
            {"head": head_s, "body": [stage_s]})


def generator_csg_next_stage(cfg, params, state, key=None):
    params, state = dict(params), dict(state)
    params["body"] = list(params["body"]) + [copy.deepcopy(params["body"][-1])]
    state["body"] = list(state["body"]) + [copy.deepcopy(state["body"][-1])]
    return params, state


def generator_csg_apply(cfg, params, state, *, noise_init, amps, key,
                        is_random: bool = False, train: bool = False,
                        compute_dtype=None, **_):
    pad = cfg.num_layer + 1  # shape-consistent pad (see module docstring)
    new_state = dict(state)
    x, hs = B.conv_block_apply(params["head"], state["head"],
                               _zero_pad3d(noise_init, 1), padding=0,
                               train=train, ndim=3, compute_dtype=compute_dtype)
    new_state["head"] = hs
    body_s = []
    x, ns = _baseline_stage_apply(cfg, params["body"][0], state["body"][0],
                                  _zero_pad3d(x, pad), train, compute_dtype)
    body_s.append(ns)
    x_prev_out = x
    for idx in range(1, len(params["body"])):
        x_up = _upscale(cfg, x_prev_out, idx)
        if is_random:
            t, h, w = x_up.shape[1:4]
            x2 = resize_trilinear(x_prev_out,
                                  (t + 2 * pad, h + 2 * pad, w + 2 * pad))
            key, sub = jax.random.split(key)
            noise = generate_noise(sub, x2.shape)
            x_in = x2 + (noise * amps[idx]).astype(x2.dtype)
        else:
            x_in = _zero_pad3d(x_up, pad)
        x_prev, ns = _baseline_stage_apply(cfg, params["body"][idx],
                                           state["body"][idx], x_in, train,
                                           compute_dtype)
        body_s.append(ns)
        x_prev_out = x_prev + x_up
    new_state["body"] = body_s
    out = conv3d_apply(params["tail"], _zero_pad3d(x_prev_out, 1), padding=0,
                       compute_dtype=compute_dtype)
    return (jnp.tanh(out),), new_state


def generator_sg_init(cfg, key) -> Tuple[Dict, Dict]:
    """GeneratorSG (networks_3d.py:294-351): growing body of full
    conv-stack stages (head..tail inside each stage)."""
    # tail conv WITHOUT bias: the reference SG stage tail omits has_bias
    # (MindSpore default False, networks_3d.py:324-325) — unlike CSG's
    # explicit has_bias=True tail (:260)
    stage_p, stage_s = _baseline_stage_init(cfg, key, cfg.nc_im, cfg.nc_im,
                                            tail_bias=False,
                                            n_blocks=cfg.num_layer + 1)
    return ({"body": [stage_p]}, {"body": [stage_s]})


def generator_sg_next_stage(cfg, params, state, key=None):
    params, state = dict(params), dict(state)
    params["body"] = list(params["body"]) + [copy.deepcopy(params["body"][-1])]
    state["body"] = list(state["body"]) + [copy.deepcopy(state["body"][-1])]
    return params, state


def generator_sg_apply(cfg, params, state, *, noise_init, amps, key,
                       is_random: bool = False, train: bool = False,
                       compute_dtype=None, **_):
    pad = cfg.num_layer + 2
    body_s = []
    x_prev_out, ns = _baseline_stage_apply(cfg, params["body"][0],
                                           state["body"][0],
                                           _zero_pad3d(noise_init, pad), train,
                                           compute_dtype)
    body_s.append(ns)
    for idx in range(1, len(params["body"])):
        x_prev_out = jnp.tanh(x_prev_out)
        x_up = _upscale(cfg, x_prev_out, idx)
        if is_random:
            t, h, w = x_up.shape[1:4]
            x2 = resize_trilinear(x_prev_out,
                                  (t + 2 * pad, h + 2 * pad, w + 2 * pad))
            key, sub = jax.random.split(key)
            noise = generate_noise(sub, x2.shape)
            x_in = x2 + (noise * amps[idx]).astype(x2.dtype)
        else:
            x_in = _zero_pad3d(x_up, pad)
        x_prev, ns = _baseline_stage_apply(cfg, params["body"][idx],
                                           state["body"][idx], x_in, train,
                                           compute_dtype)
        body_s.append(ns)
        x_prev_out = x_prev + x_up  # residual carry (reference drops it, :329-350)
    return (jnp.tanh(x_prev_out),), {"body": body_s}
