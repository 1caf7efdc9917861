"""Cross-framework NUMERIC parity: our generator/discriminator forwards vs
independent PyTorch implementations of the reference architecture, with the
weights shared through the real checkpoint converter (tools/convert.py).

The reference is a MindSpore port of the original torch HP-VAE-GAN, and its
layers mirror torch semantics one-to-one (src/modules/networks_2d.py:44-82:
Conv+BN+LeakyReLU(0.2); src/tools/spectral_norm.py:44-52: one-step power
iteration then W/sigma; src/utils/images.py:110-117: align_corners bilinear;
networks_3d.py:434-451 + src/tools/trilinear.py: align_corners trilinear).
Torch is available in this environment as an independent oracle, so these
tests pin the whole numeric chain at once — conv padding/stride layout, BN
train-mode batch statistics, SN power iteration + the converter's u/v
permutation, align-corners resize, and the tanh residual refinement — which
the per-op unit tests only cover in isolation.

The torch modules below are written from the architecture spec (not copied
from any repo) with the ORIGINAL hp-vae-gan state_dict naming the converter
targets, so `torch_model.state_dict() -> p2j_* -> our apply` is exactly the
user-facing .pth migration path, now verified numerically end-to-end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch
import torch.nn as nn
import torch.nn.functional as F
from torch.nn.utils import spectral_norm

from hpvaegan_tpu.config import Config
from hpvaegan_tpu.models import networks_2d, networks_3d
from hpvaegan_tpu.tools.convert import p2j_HPVAEGAN, p2j_WDiscriminator
from hpvaegan_tpu.utils.pyramid import scale_size_2d, scale_size_3d

# f32 with different op orders (lax vs aten convs, separable vs fused lerp)
TOL = dict(rtol=1e-4, atol=2e-5)


def _cfg(**kw):
    base = dict(nfc=8, latent_dim=8, num_layer=2, enc_blocks=1, img_size=32,
                min_size=16, max_size=32, vae_levels=2, sampling_rates=[2, 1],
                stop_scale_time=-1)
    base.update(kw)
    cfg = Config(**base).finalize()
    cfg.ar = 1.0
    cfg.org_fps = 24.0
    cfg.fps_lcm = 2
    return cfg


def _mods(nd):
    return (nn.Conv2d, nn.BatchNorm2d) if nd == 2 else (nn.Conv3d,
                                                        nn.BatchNorm3d)


class TConvBlock(nn.Module):
    """Conv + BN + LeakyReLU(0.2) (reference ConvBlock2D/3D,
    networks_2d.py:44-54, networks_3d.py:45-55)."""

    def __init__(self, cin, cout, ker, padd, nd=2):
        super().__init__()
        Conv, BN = _mods(nd)
        self.conv = Conv(cin, cout, ker, 1, padd)
        self.norm = BN(cout)

    def forward(self, x):
        return F.leaky_relu(self.norm(self.conv(x)), 0.2)


class TSNBlock(nn.Module):
    """Spectral-norm conv + LeakyReLU(0.2) (reference ConvBlock2DSN,
    networks_2d.py:56-70; SN math src/tools/spectral_norm.py:44-52)."""

    def __init__(self, cin, cout, ker, padd, nd=2):
        super().__init__()
        Conv, _ = _mods(nd)
        self.conv = spectral_norm(Conv(cin, cout, ker, 1, padd))

    def forward(self, x):
        return F.leaky_relu(self.conv(x), 0.2)


class TStack(nn.Module):
    """head + num_layer blocks + plain conv tail (the decoder and every
    refinement stage, reference networks_2d.py:207-213, 224-235)."""

    def __init__(self, cin, mid, cout, ker, padd, num_layer, nd=2):
        super().__init__()
        Conv, _ = _mods(nd)
        self.head = TConvBlock(cin, mid, ker, padd, nd)
        for i in range(num_layer):
            setattr(self, f"block{i}", TConvBlock(mid, mid, ker, padd, nd))
        self.num_layer = num_layer
        self.tail = Conv(mid, cout, ker, 1, ker // 2)

    def forward(self, x):
        x = self.head(x)
        for i in range(self.num_layer):
            x = getattr(self, f"block{i}")(x)
        return self.tail(x)


class TEncode(nn.Module):
    """SN feature stack + mu/logvar conv heads (reference Encode2DVAE,
    networks_2d.py:85-107; FeatureExtractor :73-82)."""

    def __init__(self, cin, nfc, latent, ker, enc_blocks, nd=2):
        super().__init__()
        Conv, _ = _mods(nd)
        pad = ker // 2
        feats = nn.Module()
        chans = [cin] + [nfc] * enc_blocks + [nfc]
        self.n_blocks = enc_blocks + 1
        for i in range(self.n_blocks):
            setattr(feats, f"conv_block_{i}",
                    TSNBlock(chans[i], chans[i + 1], ker, pad, nd))
        self.features = feats
        mu = nn.Module()
        mu.conv = Conv(nfc, latent, ker, 1, pad)
        logvar = nn.Module()
        logvar.conv = Conv(nfc, latent, ker, 1, pad)
        self.mu, self.logvar = mu, logvar

    def forward(self, x):
        for i in range(self.n_blocks):
            x = getattr(self.features, f"conv_block_{i}")(x)
        return self.mu.conv(x), self.logvar.conv(x)


class TGenerator(nn.Module):
    """GeneratorHPVAEGAN (reference networks_2d.py:188-282 /
    networks_3d.py:354-451) — deterministic random-mode forward (given z,
    zero per-stage noise amps): decoder -> tanh -> per stage
    [align-corners upscale to scale idx+1, tanh(stage(x_up) + x_up)]."""

    def __init__(self, cfg, n_stages, nd=2):
        super().__init__()
        self.encode = TEncode(cfg.nc_im, cfg.nfc, cfg.latent_dim,
                              cfg.ker_size, cfg.enc_blocks, nd)
        self.decoder = TStack(cfg.latent_dim, cfg.nfc, cfg.nc_im,
                              cfg.ker_size, cfg.padd_size, cfg.num_layer, nd)
        self.body = nn.ModuleList(
            TStack(cfg.nc_im, cfg.nfc, cfg.nc_im, cfg.ker_size,
                   cfg.padd_size, cfg.num_layer, nd) for _ in range(n_stages))
        self.nd = nd

    def forward_random(self, z, stage_sizes, vae_levels=None):
        mode = "bilinear" if self.nd == 2 else "trilinear"
        x = torch.tanh(self.decoder(z))
        vae_out = x
        for idx, (stage, size) in enumerate(zip(self.body, stage_sizes)):
            if vae_levels is not None and vae_levels == idx + 1:
                x = x.detach()  # the VAE-boundary stop_gradient
                # (reference networks_2d.py:269-270)
            x_up = F.interpolate(x, size=size, mode=mode, align_corners=True)
            x = torch.tanh(stage(x_up) + x_up)
        return x, vae_out


class TDiscriminator(nn.Module):
    """WDiscriminator2D/3D (reference networks_2d.py:162-185,
    networks_3d.py:170-193): SN head + num_layer SN body blocks + plain conv
    tail with hardcoded padding 1 (:178)."""

    def __init__(self, cfg, nd=2):
        super().__init__()
        Conv, _ = _mods(nd)
        pad = cfg.ker_size // 2
        self.head = TSNBlock(cfg.nc_im, cfg.nfc, cfg.ker_size, pad, nd)
        body = nn.Module()
        for i in range(cfg.num_layer):
            setattr(body, f"block{i}",
                    TSNBlock(cfg.nfc, cfg.nfc, cfg.ker_size, pad, nd))
        self.body = body
        self.num_layer = cfg.num_layer
        self.tail = Conv(cfg.nfc, 1, cfg.ker_size, 1, 1)

    def forward(self, x):
        x = self.head(x)
        for i in range(self.num_layer):
            x = getattr(self.body, f"block{i}")(x)
        return self.tail(x)


def _randomize(model, seed):
    """Non-degenerate weights: default conv init + reference-style BN gamma
    (Normal(1, 0.02)) and small random beta/bias so BN affine terms are
    actually exercised."""
    torch.manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm3d)):
                m.weight.normal_(1.0, 0.02)
                m.bias.normal_(0.0, 0.02)


def _snapshot_sd(model):
    """state_dict values are live references — torch's SN hook mutates u/v
    in-place during forward, so clone BEFORE running the torch side (our
    apply must start its power iteration from the same pre-forward u/v)."""
    return {k: v.detach().clone() for k, v in model.state_dict().items()}


def _nchw(x_jax_layout):
    """channels-last (B, *spatial, C) numpy -> torch channels-first tensor."""
    nd = x_jax_layout.ndim
    perm = (0, nd - 1) + tuple(range(1, nd - 1))
    return torch.from_numpy(np.ascontiguousarray(
        np.transpose(x_jax_layout, perm)))


def _to_last(t):
    """torch channels-first tensor -> channels-last numpy."""
    a = t.detach().numpy()
    perm = (0,) + tuple(range(2, a.ndim)) + (1,)
    return np.transpose(a, perm)


@pytest.mark.parametrize("nd", [2, 3])
def test_generator_forward_parity_vs_torch(nd):
    cfg = _cfg()
    n_stages = 2
    tG = TGenerator(cfg, n_stages, nd=nd)
    _randomize(tG, seed=10 + nd)
    sd = _snapshot_sd(tG)
    tG.train()  # reference cells never leave train mode (docs/PARITY.md)

    rng = np.random.RandomState(nd)
    if nd == 2:
        h0, w0 = scale_size_2d(0, cfg.scale_factor, cfg.stop_scale,
                               cfg.img_size, cfg.ar)
        z = rng.randn(2, h0, w0, cfg.latent_dim).astype(np.float32)
        sizes = [tuple(scale_size_2d(i + 1, cfg.scale_factor, cfg.stop_scale,
                                     cfg.img_size, cfg.ar))
                 for i in range(n_stages)]
        g_apply = networks_2d.generator_hpvaegan_apply
        enc_apply = networks_2d.encode2dvae_apply
        real = rng.randn(2, h0, w0, cfg.nc_im).astype(np.float32)
    else:
        t0, h0, w0 = scale_size_3d(0, cfg.scale_factor, cfg.stop_scale,
                                   cfg.img_size, cfg.stop_scale_time,
                                   cfg.sampling_rates, cfg.org_fps,
                                   cfg.fps_lcm, cfg.ar)
        z = rng.randn(2, t0, h0, w0, cfg.latent_dim).astype(np.float32)
        sizes = [tuple(scale_size_3d(i + 1, cfg.scale_factor, cfg.stop_scale,
                                     cfg.img_size, cfg.stop_scale_time,
                                     cfg.sampling_rates, cfg.org_fps,
                                     cfg.fps_lcm, cfg.ar))
                 for i in range(n_stages)]
        g_apply = networks_3d.generator_hpvaegan_apply
        enc_apply = networks_3d.encode3dvae_apply
        real = rng.randn(2, t0, h0, w0, cfg.nc_im).astype(np.float32)

    # ---- torch side (no per-stage noise => fully deterministic) ----
    with torch.no_grad():
        x_t, vae_t = tG.forward_random(_nchw(z), sizes)
        mu_t, logvar_t = tG.encode(_nchw(real))

    # ---- our side: same weights via the .pth migration converter ----
    params, state = p2j_HPVAEGAN({"state_dict": sd}, ndim=nd)
    amps = jnp.zeros((cfg.stop_scale + 2,))
    (x_j, vae_j, _, _), _ = g_apply(cfg, params, state,
                                    noise_init=jnp.asarray(z), amps=amps,
                                    key=jax.random.PRNGKey(0),
                                    is_random=True, train=True)
    np.testing.assert_allclose(np.asarray(vae_j), _to_last(vae_t), **TOL)
    np.testing.assert_allclose(np.asarray(x_j), _to_last(x_t), **TOL)

    # encoder heads: exercises the SN power iteration + converter u/v perm
    (mu_j, logvar_j), _ = enc_apply(cfg, params["encode"], state["encode"],
                                    jnp.asarray(real))
    np.testing.assert_allclose(np.asarray(mu_j), _to_last(mu_t), **TOL)
    np.testing.assert_allclose(np.asarray(logvar_j), _to_last(logvar_t),
                               **TOL)


@pytest.mark.parametrize("nd", [2, 3])
def test_discriminator_forward_parity_vs_torch(nd):
    cfg = _cfg()
    tD = TDiscriminator(cfg, nd=nd)
    _randomize(tD, seed=20 + nd)
    sd = _snapshot_sd(tD)
    tD.train()

    rng = np.random.RandomState(4 + nd)
    shape = (2, 16, 16, cfg.nc_im) if nd == 2 else (2, 4, 12, 12, cfg.nc_im)
    x = rng.randn(*shape).astype(np.float32)
    with torch.no_grad():
        y_t = tD(_nchw(x))

    params, state = p2j_WDiscriminator({"state_dict": sd}, ndim=nd)
    d_apply = (networks_2d.wdiscriminator2d_apply if nd == 2
               else networks_3d.wdiscriminator3d_apply)
    y_j, _ = d_apply(cfg, params, state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_j), _to_last(y_t), **TOL)


class TEncodeNB(nn.Module):
    """Encode2DVAE_nb / Encode3DVAE_nb (reference networks_2d.py:110-137,
    networks_3d.py:115-144): SN feature stack, sigmoid Bernoulli gate
    multiplied into the features, then GLOBAL-mean-pooled mu/logvar heads."""

    def __init__(self, cin, nfc, latent, ker, enc_blocks, nd=2):
        super().__init__()
        Conv, _ = _mods(nd)
        pad = ker // 2
        base = TEncode(cin, nfc, latent, ker, enc_blocks, nd)
        self.features = base.features
        self.n_blocks = base.n_blocks
        self.mu, self.logvar = base.mu, base.logvar
        bern = nn.Module()
        bern.conv = Conv(nfc, 1, ker, 1, pad)
        self.bern = bern

    def forward(self, x):
        for i in range(self.n_blocks):
            x = getattr(self.features, f"conv_block_{i}")(x)
        gate = torch.sigmoid(self.bern.conv(x))
        x = gate * x
        pool = tuple(range(2, x.ndim))
        mu = self.mu.conv(x).mean(dim=pool, keepdim=True)
        logvar = self.logvar.conv(x).mean(dim=pool, keepdim=True)
        return mu, logvar, gate


@pytest.mark.parametrize("nd", [2, 3])
def test_nb_encoder_parity_vs_torch(nd):
    cfg = _cfg()
    tE = TEncodeNB(cfg.nc_im, cfg.nfc, cfg.latent_dim, cfg.ker_size,
                   cfg.enc_blocks, nd=nd)
    _randomize(tE, seed=50 + nd)
    sd = _snapshot_sd(tE)
    tE.train()

    rng = np.random.RandomState(nd + 8)
    shape = (2, 14, 14, cfg.nc_im) if nd == 2 else (2, 4, 10, 10, cfg.nc_im)
    x = rng.randn(*shape).astype(np.float32)
    with torch.no_grad():
        mu_t, logvar_t, gate_t = tE(_nchw(x))

    # the nb encoder shares the HPVAEGAN converter (same key families plus
    # the bern head); a standalone encoder sits under the generator's
    # `encode.` prefix in a real checkpoint
    params, state = p2j_HPVAEGAN(
        {"state_dict": {f"encode.{k}": v for k, v in sd.items()}}, ndim=nd)
    enc_apply = (networks_2d.encode2dvae_nb_apply if nd == 2
                 else networks_3d.encode3dvae_nb_apply)
    (mu_j, logvar_j, gate_j), _ = enc_apply(cfg, params["encode"],
                                            state["encode"], jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mu_j), _to_last(mu_t), **TOL)
    np.testing.assert_allclose(np.asarray(logvar_j), _to_last(logvar_t),
                               **TOL)
    np.testing.assert_allclose(np.asarray(gate_j), _to_last(gate_t), **TOL)


@pytest.mark.parametrize("vae_levels", [3, 2])
def test_generator_weight_gradients_parity_vs_torch(vae_levels):
    """Gradient-level parity of the generator backward: d MSE(G(z), target)
    / d params vs torch autograd. The forward tests can't catch a wrong VJP;
    this pins the train-mode BatchNorm backward (gradients THROUGH the batch
    statistics), the align-corners-upscale VJP (gather+lerp transpose vs
    torch's interpolate backward), and the tanh-residual chain rule.
    vae_levels=3 keeps the VAE-boundary stop_gradient OUT of the 2-stage
    body (full flow into the decoder); vae_levels=2 puts it before stage 2
    and additionally pins the boundary LOCATION (decoder/stage-1 grads zero
    in both frameworks, reference networks_2d.py:269-270)."""
    cfg = _cfg(vae_levels=vae_levels)
    n_stages = 2
    tG = TGenerator(cfg, n_stages, nd=2)
    _randomize(tG, seed=45)
    sd = _snapshot_sd(tG)
    tG.train()

    rng = np.random.RandomState(13)
    h0, w0 = scale_size_2d(0, cfg.scale_factor, cfg.stop_scale, cfg.img_size,
                           cfg.ar)
    z = rng.randn(2, h0, w0, cfg.latent_dim).astype(np.float32)
    sizes = [tuple(scale_size_2d(i + 1, cfg.scale_factor, cfg.stop_scale,
                                 cfg.img_size, cfg.ar))
             for i in range(n_stages)]
    tgt = rng.randn(2, *sizes[-1], cfg.nc_im).astype(np.float32)

    x_t, _ = tG.forward_random(_nchw(z), sizes, vae_levels=vae_levels)
    loss_t = ((x_t - _nchw(tgt)) ** 2).mean()
    loss_t.backward()

    params, state = p2j_HPVAEGAN({"state_dict": sd}, ndim=2)
    amps = jnp.zeros((cfg.stop_scale + 2,))

    def loss_of(p):
        (x, _, _, _), _ = networks_2d.generator_hpvaegan_apply(
            cfg, p, state, noise_init=jnp.asarray(z), amps=amps,
            key=jax.random.PRNGKey(0), is_random=True, train=True)
        return jnp.mean((x - jnp.asarray(tgt)) ** 2)

    loss_j, grads = jax.value_and_grad(loss_of)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               rtol=1e-5)

    def g_t(mod_attr):
        t = tG
        for a in mod_attr.split("."):
            t = t[int(a)] if a.isdigit() else getattr(t, a)
        # a torch param behind the detach boundary never receives a grad
        return None if t.grad is None else t.grad.detach().numpy()

    checks = [
        (grads["decoder"]["blocks"][0]["conv"]["w"],
         g_t("decoder.head.conv.weight"), True),
        (grads["decoder"]["blocks"][0]["bn"]["gamma"],
         g_t("decoder.head.norm.weight"), False),
        (grads["decoder"]["blocks"][0]["bn"]["beta"],
         g_t("decoder.head.norm.bias"), False),
        (grads["body"][0]["tail"]["w"], g_t("body.0.tail.weight"), True),
        (grads["body"][1]["blocks"][1]["conv"]["w"],
         g_t("body.1.block0.conv.weight"), True),
        (grads["body"][1]["blocks"][1]["conv"]["b"],
         g_t("body.1.block0.conv.bias"), False),
    ]
    for ours, theirs, is_conv_w in checks:
        got = np.asarray(ours)
        if is_conv_w:
            got = np.transpose(got, (3, 2, 0, 1))  # HWIO -> OIHW
        if theirs is None:  # severed in torch -> must be zero here too
            assert float(np.max(np.abs(got))) == 0.0
        else:
            np.testing.assert_allclose(got, theirs, rtol=1e-3, atol=1e-7)

    # z itself got no gradient path severed: encoder params untouched
    enc_leaf = grads["encode"]["features"][0]["snconv"]["w"]
    assert float(jnp.max(jnp.abs(enc_leaf))) == 0.0  # random mode skips enc


def test_vae_nb_generator_forward_parity_vs_torch():
    """GeneratorVAE_nb random-mode forward (reference networks_2d.py:285-360):
    decoder consumes z_norm * z_bern; refinement chain as HPVAEGAN."""
    cfg = _cfg()
    n_stages = 2
    nd = 2

    class TGenNB(nn.Module):
        def __init__(self):
            super().__init__()
            self.encode = TEncodeNB(cfg.nc_im, cfg.nfc, cfg.latent_dim,
                                    cfg.ker_size, cfg.enc_blocks, nd)
            self.decoder = TStack(cfg.latent_dim, cfg.nfc, cfg.nc_im,
                                  cfg.ker_size, cfg.padd_size, cfg.num_layer,
                                  nd)
            self.body = nn.ModuleList(
                TStack(cfg.nc_im, cfg.nfc, cfg.nc_im, cfg.ker_size,
                       cfg.padd_size, cfg.num_layer, nd)
                for _ in range(n_stages))

        def forward_random(self, z_norm, z_bern, sizes):
            x = torch.tanh(self.decoder(z_norm * z_bern))
            for stage, size in zip(self.body, sizes):
                x_up = F.interpolate(x, size=size, mode="bilinear",
                                     align_corners=True)
                x = torch.tanh(stage(x_up) + x_up)
            return x

    tG = TGenNB()
    _randomize(tG, seed=61)
    sd = _snapshot_sd(tG)
    tG.train()

    rng = np.random.RandomState(19)
    h0, w0 = scale_size_2d(0, cfg.scale_factor, cfg.stop_scale, cfg.img_size,
                           cfg.ar)
    z = rng.randn(2, h0, w0, cfg.latent_dim).astype(np.float32)
    zb = (rng.rand(2, h0, w0, 1) < 0.5).astype(np.float32)
    sizes = [tuple(scale_size_2d(i + 1, cfg.scale_factor, cfg.stop_scale,
                                 cfg.img_size, cfg.ar))
             for i in range(n_stages)]
    with torch.no_grad():
        x_t = tG.forward_random(_nchw(z), _nchw(zb), sizes)

    params, state = p2j_HPVAEGAN({"state_dict": sd}, ndim=nd)
    amps = jnp.zeros((cfg.stop_scale + 2,))
    (x_j, _, _, _, _), _ = networks_2d.generator_vae_nb_apply(
        cfg, params, state, noise_init=jnp.asarray(z),
        noise_init_bern=jnp.asarray(zb), amps=amps,
        key=jax.random.PRNGKey(0), is_random=True, train=True)
    np.testing.assert_allclose(np.asarray(x_j), _to_last(x_t), **TOL)


@pytest.mark.parametrize("flat", [False, True])
def test_clipped_adam_trajectory_parity_vs_torch(flat):
    """ClippedAdam (per-TENSOR L2 clip before Adam, per-group LRs — reference
    optimizers.py:33-43 + train_image.py:51-83) against torch's Adam +
    per-tensor clip_grad_norm_ over 5 steps with mixed clipped/unclipped
    gradients. Covers both the optax chain and the fused single-buffer
    implementation (--flat-opt)."""
    from hpvaegan_tpu.optim import clipped_adam

    clip, b1, b2 = 0.5, 0.5, 0.999
    rng = np.random.RandomState(17)
    w0 = rng.randn(4, 3, 3, 2).astype(np.float32) * 0.1
    b0 = rng.randn(4).astype(np.float32) * 0.1

    # torch: two param groups with different lrs (the per-block LR ladder)
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    bt = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    opt_t = torch.optim.Adam([{"params": [wt], "lr": 5e-3},
                              {"params": [bt], "lr": 5e-4}], betas=(b1, b2))

    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    lr_tree = {"w": 5e-3, "b": 5e-4}
    opt_j = clipped_adam(lr_tree, beta1=b1, beta2=b2, grad_clip=clip,
                         flat=flat)
    opt_state = opt_j.init(params)

    for step in range(5):
        gw = rng.randn(*w0.shape).astype(np.float32)  # norm >> clip: clips
        gb = rng.randn(*b0.shape).astype(np.float32) * 0.01  # under clip
        opt_t.zero_grad()
        wt.grad = torch.from_numpy(gw.copy())
        bt.grad = torch.from_numpy(gb.copy())
        # per-TENSOR clip, like nn.ClipByNorm applied leaf-wise
        torch.nn.utils.clip_grad_norm_([wt], clip)
        torch.nn.utils.clip_grad_norm_([bt], clip)
        opt_t.step()

        grads = {"w": jnp.asarray(gw), "b": jnp.asarray(gb)}
        updates, opt_state = opt_j.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

        # torch's clip scales by max_norm/(norm + 1e-6) vs our exact
        # max_norm/norm; the ~1e-7-relative grad difference amplifies on
        # elements whose Adam update m_hat/sqrt(v_hat) is near zero, hence
        # the absolute floor (updates are ~5e-3/step)
        np.testing.assert_allclose(np.asarray(params["w"]),
                                   wt.detach().numpy(), rtol=1e-5,
                                   atol=1e-6, err_msg=f"step {step}")
        np.testing.assert_allclose(np.asarray(params["b"]),
                                   bt.detach().numpy(), rtol=1e-5,
                                   atol=1e-6, err_msg=f"step {step}")


def test_gradient_penalty_parity_vs_torch_autograd():
    """WGAN-GP parity at VALUE and WEIGHT-GRADIENT level: the grad-inside-grad
    (jax.grad of D w.r.t. its input, inside the outer loss grad — reference
    losses.py:47-52 via ops.GradOperation) against torch.autograd with
    create_graph=True on the same weights. Pins the double-backward through
    the spectral-norm normalization (u/v constants) and the per-channel
    gradient-norm reduction."""
    from hpvaegan_tpu.losses import gradient_penalty

    cfg = _cfg()
    tD = TDiscriminator(cfg, nd=2)
    _randomize(tD, seed=41)
    sd = _snapshot_sd(tD)
    tD.train()

    rng = np.random.RandomState(11)
    real = rng.randn(2, 16, 16, cfg.nc_im).astype(np.float32)
    fake = rng.randn(2, 16, 16, cfg.nc_im).astype(np.float32)
    alpha, lam = 0.37, 0.1

    # ---- torch: one D application on the interpolate (fresh u/v from sd) --
    interp_t = (alpha * _nchw(real) + (1 - alpha) * _nchw(fake)
                ).requires_grad_(True)
    d_out = tD(interp_t)
    g_in, = torch.autograd.grad(d_out.sum(), interp_t, create_graph=True)
    # per-CHANNEL gradient norm (reference LpNorm(p=2, axis=1)); channel is
    # dim 1 in torch layout, the last axis in ours
    norms_t = torch.sqrt((g_in ** 2).sum(dim=1) + 1e-12)
    gp_t = ((norms_t - 1) ** 2).mean() * lam
    gp_t.backward()
    grad_w_head_t = tD.head.conv.weight_orig.grad.detach().numpy()
    grad_w_tail_t = tD.tail.weight.grad.detach().numpy()

    # ---- ours: same weights via the converter, jax.grad over params -------
    params, state = p2j_WDiscriminator({"state_dict": sd}, ndim=2)

    def gp_of(p):
        return gradient_penalty(
            lambda x: networks_2d.wdiscriminator2d_apply(cfg, p, state, x)[0],
            jnp.asarray(real), jnp.asarray(fake), alpha, lam)

    gp_j, grads_j = jax.value_and_grad(gp_of)(params)
    np.testing.assert_allclose(float(gp_j), float(gp_t.detach()), rtol=1e-4)

    # weight grads transform like the weights: HWIO -> OIHW to compare
    def to_oihw(w):
        return np.transpose(np.asarray(w), (3, 2, 0, 1))

    np.testing.assert_allclose(to_oihw(grads_j["head"]["snconv"]["w"]),
                               grad_w_head_t, rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(to_oihw(grads_j["tail"]["w"]),
                               grad_w_tail_t, rtol=1e-3, atol=1e-6)


def _jblock_from_torch(tb):
    """ConvBlock params/state pytree from a TConvBlock."""
    from hpvaegan_tpu.tools.convert import _conv_w, _np
    return ({"conv": {"w": _conv_w(tb.conv.weight, 3),
                      "b": _np(tb.conv.bias)},
             "bn": {"gamma": _np(tb.norm.weight), "beta": _np(tb.norm.bias)}},
            {"bn": {"mean": _np(tb.norm.running_mean),
                    "var": _np(tb.norm.running_var)}})


class TBaselineStage(nn.Module):
    """Padding-0 ConvBlock3D stack + optional plain conv tail (the CSG/SG
    stage unit, reference networks_3d.py:252-263, 317-327)."""

    def __init__(self, cin, nfc, ker, n_blocks, cout_tail=None,
                 tail_bias=True):
        super().__init__()
        chans = [cin] + [nfc] * n_blocks
        self.blocks = nn.ModuleList(
            TConvBlock(chans[i], chans[i + 1], ker, 0, nd=3)
            for i in range(n_blocks))
        self.tail = (nn.Conv3d(nfc, cout_tail, ker, 1, 0, bias=tail_bias)
                     if cout_tail is not None else None)

    def forward(self, x):
        for b in self.blocks:
            x = b(x)
        return self.tail(x) if self.tail is not None else x

    def to_pytree(self):
        from hpvaegan_tpu.tools.convert import _conv_w, _np
        bp, bs = zip(*(_jblock_from_torch(b) for b in self.blocks))
        params = {"blocks": list(bp)}
        if self.tail is not None:
            params["tail"] = {"w": _conv_w(self.tail.weight, 3)}
            if self.tail.bias is not None:
                params["tail"]["b"] = _np(self.tail.bias)
        return params, {"blocks": list(bs)}


def _pad3d_t(x, p):
    return F.pad(x, (p, p, p, p, p, p))


def _stage_sizes_3d(cfg, n, start=1):
    return [tuple(scale_size_3d(i, cfg.scale_factor, cfg.stop_scale,
                                cfg.img_size, cfg.stop_scale_time,
                                cfg.sampling_rates, cfg.org_fps, cfg.fps_lcm,
                                cfg.ar)) for i in range(start, start + n)]


def test_generator_csg_parity_vs_torch():
    """GeneratorCSG reconstruction forward (reference networks_3d.py:229-291,
    with the shape-consistent pad fix documented in the module): shared
    head/tail, growing body of padding-0 stacks fed via explicit outer
    zero-pads, residual x_prev + x_up carry, trilinear upscales."""
    from hpvaegan_tpu.models.networks_3d import generator_csg_apply
    from hpvaegan_tpu.tools.convert import _conv_w, _np

    cfg = _cfg()
    torch.manual_seed(71)
    pad = cfg.num_layer + 1
    head = TConvBlock(cfg.nc_im, cfg.nfc, cfg.ker_size, 0, nd=3)
    stages = nn.ModuleList(
        TBaselineStage(cfg.nfc, cfg.nfc, cfg.ker_size, cfg.num_layer + 1)
        for _ in range(2))
    tail = nn.Conv3d(cfg.nfc, cfg.nc_im, cfg.ker_size, 1, 0)
    _randomize(nn.ModuleList([head, stages, tail]), seed=71)

    head_p, head_s = _jblock_from_torch(head)
    body = [s.to_pytree() for s in stages]
    params = {"head": head_p, "body": [b[0] for b in body],
              "tail": {"w": _conv_w(tail.weight, 3), "b": _np(tail.bias)}}
    state = {"head": head_s, "body": [b[1] for b in body]}

    rng = np.random.RandomState(23)
    t0, h0, w0 = scale_size_3d(0, cfg.scale_factor, cfg.stop_scale,
                               cfg.img_size, cfg.stop_scale_time,
                               cfg.sampling_rates, cfg.org_fps, cfg.fps_lcm,
                               cfg.ar)
    z = rng.randn(1, t0, h0, w0, cfg.nc_im).astype(np.float32)
    sizes = _stage_sizes_3d(cfg, len(stages) - 1)

    with torch.no_grad():
        for m in (head, *stages):
            m.train()
        x = head(_pad3d_t(_nchw(z), 1))
        x = stages[0](_pad3d_t(x, pad))
        x_prev_out = x
        for stage, size in zip(list(stages)[1:], sizes):
            x_up = F.interpolate(x_prev_out, size=size, mode="trilinear",
                                 align_corners=True)
            x_prev_out = stage(_pad3d_t(x_up, pad)) + x_up
        out_t = torch.tanh(F.conv3d(_pad3d_t(x_prev_out, 1), tail.weight,
                                    tail.bias))

    (out_j,), _ = generator_csg_apply(cfg, params, state,
                                      noise_init=jnp.asarray(z),
                                      amps=jnp.zeros((cfg.stop_scale + 2,)),
                                      key=jax.random.PRNGKey(0),
                                      is_random=False, train=True)
    np.testing.assert_allclose(np.asarray(out_j), _to_last(out_t), **TOL)


def test_generator_sg_parity_vs_torch():
    """GeneratorSG reconstruction forward (reference networks_3d.py:294-351
    made functional: unset self.opt fixed, residual carry restored, bias-free
    stage tails per the MindSpore has_bias default)."""
    from hpvaegan_tpu.models.networks_3d import generator_sg_apply

    cfg = _cfg()
    torch.manual_seed(72)
    pad = cfg.num_layer + 2
    stages = nn.ModuleList(
        TBaselineStage(cfg.nc_im, cfg.nfc, cfg.ker_size, cfg.num_layer + 1,
                       cout_tail=cfg.nc_im, tail_bias=False)
        for _ in range(2))
    _randomize(stages, seed=72)
    body = [s.to_pytree() for s in stages]
    params = {"body": [b[0] for b in body]}
    state = {"body": [b[1] for b in body]}

    rng = np.random.RandomState(29)
    t0, h0, w0 = scale_size_3d(0, cfg.scale_factor, cfg.stop_scale,
                               cfg.img_size, cfg.stop_scale_time,
                               cfg.sampling_rates, cfg.org_fps, cfg.fps_lcm,
                               cfg.ar)
    z = rng.randn(1, t0, h0, w0, cfg.nc_im).astype(np.float32)
    sizes = _stage_sizes_3d(cfg, len(stages) - 1)

    with torch.no_grad():
        stages.train()
        x_prev_out = stages[0](_pad3d_t(_nchw(z), pad))
        for stage, size in zip(list(stages)[1:], sizes):
            x_prev_out = torch.tanh(x_prev_out)
            x_up = F.interpolate(x_prev_out, size=size, mode="trilinear",
                                 align_corners=True)
            x_prev_out = stage(_pad3d_t(x_up, pad)) + x_up
        out_t = torch.tanh(x_prev_out)

    (out_j,), _ = generator_sg_apply(cfg, params, state,
                                     noise_init=jnp.asarray(z),
                                     amps=jnp.zeros((cfg.stop_scale + 2,)),
                                     key=jax.random.PRNGKey(0),
                                     is_random=False, train=True)
    # SG's un-normalized residual carry (no BN between stages' outputs)
    # accumulates slightly more f32 noise than the other nets
    np.testing.assert_allclose(np.asarray(out_j), _to_last(out_t),
                               rtol=1e-4, atol=1e-4)


def test_wdiscriminator_baselines_parity_vs_torch():
    """WDiscriminatorBaselines (reference networks_3d.py:196-226): explicit
    outer zero-pad, plain-conv head (no BN), SN body, conv tail."""
    from hpvaegan_tpu.models.networks_3d import wdiscriminator_baselines_apply
    from hpvaegan_tpu.tools.convert import _conv_w, _np, _sn_conv

    cfg = _cfg()
    torch.manual_seed(73)
    head = nn.Conv3d(cfg.nc_im, cfg.nfc, cfg.ker_size, 1, cfg.padd_size)
    body = nn.ModuleList(
        TSNBlock(cfg.nfc, cfg.nfc, cfg.ker_size, cfg.ker_size // 2, nd=3)
        for _ in range(cfg.num_layer))
    tail = nn.Conv3d(cfg.nfc, 1, cfg.ker_size, 1, cfg.padd_size)

    params = {"head": {"conv": {"w": _conv_w(head.weight, 3),
                                "b": _np(head.bias)}},
              "body": [], "tail": {"w": _conv_w(tail.weight, 3),
                                   "b": _np(tail.bias)}}
    state = {"head": {}, "body": []}
    for b in body:
        entries = {k.split(".")[-1]: v.detach().clone()
                   for k, v in b.conv.state_dict().items()}
        bp, bs = _sn_conv(entries, 3)
        params["body"].append(bp)
        state["body"].append(bs)

    rng = np.random.RandomState(31)
    x = rng.randn(1, 4, 10, 10, cfg.nc_im).astype(np.float32)
    with torch.no_grad():
        body.train()
        y = _pad3d_t(_nchw(x), cfg.num_layer + 2)
        y = F.leaky_relu(F.conv3d(y, head.weight, head.bias,
                                  padding=cfg.padd_size), 0.2)
        for b in body:
            y = b(y)
        y_t = F.conv3d(y, tail.weight, tail.bias, padding=cfg.padd_size)

    y_j, _ = wdiscriminator_baselines_apply(cfg, params, state,
                                            jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_j), _to_last(y_t), **TOL)


def test_c3d_feature_blocks_parity_vs_torch():
    """The SVFID C3D backbone (metrics/c3d.py — the reference's is
    non-functional, src/sinFID/c3d.py:59-60,132): conv3d/relu/maxpool block
    outputs vs a torch twin fed the same weights. Pins the NDHWC conv
    padding, the (1,2,2)/(2,2,2) VALID pooling ladder, and the block split
    the per-position Frechet features are read from."""
    from hpvaegan_tpu.metrics.c3d import C3D, _BLOCKS, _POOLS

    net = C3D(output_blocks=[0, 1, 2, 3], seed=3)  # seeded random weights

    convs = {}
    for block in _BLOCKS:
        for name, cin, cout in block:
            c = nn.Conv3d(cin, cout, 3, 1, 1)
            with torch.no_grad():
                # DHWIO -> OIDHW
                c.weight.copy_(torch.from_numpy(np.transpose(
                    net.params[f"{name}.w"], (4, 3, 0, 1, 2)).copy()))
                c.bias.copy_(torch.from_numpy(net.params[f"{name}.b"].copy()))
            convs[name] = c

    rng = np.random.RandomState(5)
    x01 = rng.rand(1, 8, 32, 32, 3).astype(np.float32)  # (B,T,H,W,C) in [0,1]
    outs_j = net(x01)

    with torch.no_grad():
        x = _nchw(x01) * 2.0 - 1.0  # random-init input scaling (c3d.py)
        for bi, block in enumerate(_BLOCKS):
            for name, _, _ in block:
                x = F.relu(convs[name](x))
            x = F.max_pool3d(x, _POOLS[bi], _POOLS[bi])
            np.testing.assert_allclose(np.asarray(outs_j[bi]), _to_last(x),
                                       **TOL)


def test_inception_feature_blocks_parity_vs_torch():
    """The SIFID InceptionV3 backbone (metrics/inception.py, all 4 blocks)
    vs a torch-functional twin fed the same weights. The architecture spec
    (which convs/channels) is pinned by test_metric_weights; this pins the
    NUMERIC semantics torch would give those weights: conv stride/pad
    arithmetic, inference-mode BN with eps 1e-3, the pytorch-fid branch
    avg-pools with count_include_pad=False, max-pools, branch concat order,
    and the final adaptive average pool. Absolute-sinFID parity remains
    blocked only on pretrained weight VALUES (BASELINE.md), not math."""
    from hpvaegan_tpu.metrics.inception import (InceptionV3, _STEM0, _STEM1,
                                                _MIXED2, _MIXED3)

    net = InceptionV3(output_blocks=[0, 1, 2, 3], seed=7)
    P = net.params

    def t32(a):
        # the random init is f64 (NumPy promotion); jnp.asarray casts it to
        # f32 on our side, so feed torch the same f32 values
        return torch.from_numpy(np.ascontiguousarray(a, np.float32))

    def conv_bn_t(x, name, stride, pad):
        w = t32(np.transpose(P[f"{name}.w"], (3, 2, 0, 1)))
        y = F.conv2d(x, w, stride=stride, padding=pad)
        y = F.batch_norm(y, t32(P[f"{name}.bn_mean"]),
                         t32(P[f"{name}.bn_var"]),
                         t32(P[f"{name}.bn_gamma"]),
                         t32(P[f"{name}.bn_beta"]),
                         training=False, eps=1e-3)
        return F.relu(y)

    def pool_t(x, kind, k, s, p):
        if kind == "maxpool":
            return F.max_pool2d(x, k, stride=s, padding=p)
        return F.avg_pool2d(x, k, stride=s, padding=p,
                            count_include_pad=False)

    def run_branch_t(x, branch):
        for item in branch:
            if item[0] == "split":
                x = torch.cat([conv_bn_t(x, sp[0], sp[3], sp[4])
                               for sp in item[1]], dim=1)
            elif item[0] in ("avgpool", "maxpool"):
                x = pool_t(x, item[0], item[2], item[3], item[4])
            else:
                name, _, _, s, p = item
                x = conv_bn_t(x, name, s, p)
        return x

    def run_specs_t(x, specs):
        for spec in specs:
            if isinstance(spec, dict):
                x = torch.cat([run_branch_t(x, b) for b in spec["branches"]],
                              dim=1)
            else:
                name, _, _, s, p = spec
                x = conv_bn_t(x, name, s, p)
        return x

    rng = np.random.RandomState(9)
    x01 = rng.rand(1, 96, 96, 3).astype(np.float32)
    outs_j = net(x01)

    with torch.no_grad():
        x = _nchw(x01) * 2.0 - 1.0
        x = run_specs_t(x, _STEM0)
        x = F.max_pool2d(x, 3, stride=2)
        np.testing.assert_allclose(np.asarray(outs_j[0]), _to_last(x), **TOL)
        x = run_specs_t(x, _STEM1)
        x = F.max_pool2d(x, 3, stride=2)
        np.testing.assert_allclose(np.asarray(outs_j[1]), _to_last(x), **TOL)
        x = run_specs_t(x, _MIXED2)
        np.testing.assert_allclose(np.asarray(outs_j[2]), _to_last(x), **TOL)
        x = run_specs_t(x, _MIXED3)
        x = F.adaptive_avg_pool2d(x, 1)
        np.testing.assert_allclose(np.asarray(outs_j[3]), _to_last(x), **TOL)


def test_sn_second_forward_matches_torch_uv_trajectory():
    """The carried (u, v) state must evolve like torch's in-place hook: after
    one forward, a SECOND forward (fresh power iteration from the updated
    vectors) must still agree — pins that sn_conv_apply returns the
    post-iteration u/v, not the inputs."""
    cfg = _cfg()
    tD = TDiscriminator(cfg, nd=2)
    _randomize(tD, seed=33)
    sd = _snapshot_sd(tD)
    tD.train()

    rng = np.random.RandomState(7)
    x1 = rng.randn(2, 16, 16, cfg.nc_im).astype(np.float32)
    x2 = rng.randn(2, 16, 16, cfg.nc_im).astype(np.float32)
    with torch.no_grad():
        tD(_nchw(x1))            # mutates u/v in place
        y2_t = tD(_nchw(x2))

    params, state = p2j_WDiscriminator({"state_dict": sd}, ndim=2)
    _, state1 = networks_2d.wdiscriminator2d_apply(cfg, params, state,
                                                   jnp.asarray(x1))
    y2_j, _ = networks_2d.wdiscriminator2d_apply(cfg, params, state1,
                                                 jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(y2_j), _to_last(y2_t), **TOL)
