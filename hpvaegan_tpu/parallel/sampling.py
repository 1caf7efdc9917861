"""Data-parallel batched sample generation over a device mesh.

BASELINE config 5: "batched diverse-sample generation, 64 samples/batch with
on-device sinFID". The reference generates samples one-by-one in a Python
loop (eval_image.py:54-61); here a single pjit'ed forward shards the sample
batch over the 'data' mesh axis — on one chip it's a plain batched forward,
on a pod slice it scales linearly with no code change."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import models
from ..utils import pyramid
from .mesh import batch_sharding, make_mesh, replicate_sharding
from .multihost import to_host


def sharded_sampler(cfg, g_params, g_state, ndim: int = 2, mesh=None,
                    train: bool = True, z_tail=None):
    """Returns sample(num_samples, key) -> (N, ..., C) host array in [-1,1].

    num_samples must be a multiple of the mesh's data-axis size; the noise
    batch is sharded over 'data', params are replicated, and XLA runs the
    fully-parallel forward with zero collectives (embarrassingly parallel).

    train=True (default) runs BatchNorm on BATCH STATISTICS, per sample
    (vmapped batch-1 forwards) — exact parity with the reference, whose
    eval never calls set_train(False) (MindSpore cells default to the
    training phase) and generates one sample per G call
    (eval_image.py:56-59). Eval-mode moving stats (train=False) wash out
    sample content badly on short runs — the moving averages lag the
    per-scale activation statistics this one-sample-overfit model family
    depends on (SinGAN-family models are conventionally sampled in train
    mode).

    z_tail overrides the per-sample noise shape (e.g. the eval CLI's
    eval-scale time depth, reference eval_video.py:36-39, or the baselines'
    nc_im-channel Z_init)."""
    mesh = mesh or make_mesh()
    g_apply = models.get_generator(cfg.generator, ndim)[1]
    h0, w0 = pyramid.scale_size_2d(0, cfg.scale_factor, cfg.stop_scale,
                                   cfg.img_size, cfg.ar)
    if z_tail is None:
        if ndim == 2:
            z_tail = (h0, w0, cfg.latent_dim)
        else:
            _, td0, _ = pyramid.get_fps_td_by_index(0, cfg.stop_scale_time,
                                                    cfg.sampling_rates,
                                                    cfg.org_fps, cfg.fps_lcm)
            z_tail = (td0, h0, w0, cfg.latent_dim)
    z_tail = tuple(z_tail)

    amps = np.zeros((cfg.stop_scale + 2,), np.float32)
    amps[:len(cfg.Noise_Amps)] = cfg.Noise_Amps

    repl = replicate_sharding(mesh)
    g_params = jax.device_put(g_params, repl)
    g_state = jax.device_put(g_state, repl)
    amps_dev = jax.device_put(jnp.asarray(amps), repl)

    import functools

    @functools.partial(jax.jit, static_argnums=(1,))
    def forward(key, batch):
        kn, kf = jax.random.split(key)
        # noise generated IN-jit: zero host->device traffic per call
        noise = jax.random.normal(kn, (batch,) + z_tail)
        noise = jax.lax.with_sharding_constraint(
            noise, batch_sharding(mesh, noise.ndim))
        if train:
            # per-sample batch-1 forwards (vmapped): BN statistics are per
            # sample, matching the reference's one-sample-per-call loop
            def one(z, k):
                out, _ = g_apply(cfg, g_params, g_state, video=None,
                                 amps=amps_dev, noise_init=z[None], key=k,
                                 is_random=True, train=True)
                return out[0][0]

            return jax.vmap(one)(noise, jax.random.split(kf, batch))
        out, _ = g_apply(cfg, g_params, g_state, video=None, amps=amps_dev,
                         noise_init=noise, key=kf, is_random=True,
                         train=train)
        return out[0]

    def sample(num_samples: int, key, device: bool = False):
        """device=True returns the device array (no host transfer — feed it
        to on-device sinFID or further processing); default returns numpy."""
        dp = mesh.shape["data"]
        assert num_samples % dp == 0, \
            f"num_samples {num_samples} not divisible by data axis {dp}"
        with mesh:
            out = forward(key, num_samples)
        # multi-process: the batch is sharded across processes; to_host
        # allgathers so every process returns the identical full batch
        return out if device else to_host(out)

    return sample


@jax.jit
def _per_sample_stats(feats):
    """(B, *positions, C) features -> per-sample (mu: C, sigma: CxC)."""
    b = feats.shape[0]
    flat = feats.reshape(b, -1, feats.shape[-1]).astype(jnp.float32)
    mu = jnp.mean(flat, axis=1)
    centered = flat - mu[:, None, :]
    n = flat.shape[1]
    sigma = jnp.einsum("bpc,bpd->bcd", centered, centered) / (n - 1)
    return mu, sigma


def make_sampled_sifid(cfg, g_params, g_state, real_image, mesh=None,
                       dims: int = 64, z_tail=None):
    """Reusable BASELINE-config-5 pipeline: batched diverse-sample generation
    WITH on-device sinFID. Samples and Inception block features never leave
    the device; only per-sample (mu: dims, sigma: dims x dims) statistics
    transfer to the host for the tiny Frechet sqrtm.

    Returns run(num_samples, key) -> list[float]. Building once and calling
    repeatedly amortizes the jit closures (a fresh build re-traces the
    sampler + Inception, ~17s through the remote tunnel; warm calls ~0.3s).

    real_image: (H, W, 3) float in [0,1]; its stats are computed once at the
    generation scale.

    run(..., return_samples=k) additionally transfers the FIRST k samples to
    the host (a small d2h; the FID statistics stay device-resident) and
    returns (vals, samples_k) — the eval CLI uses this to keep the
    reference's artifact contract (random_samples.npy + PNGs,
    eval_image.py:179-190) in the fast path."""
    from ..metrics.fid import calculate_frechet_distance
    from ..metrics.inception import InceptionV3
    from ..ops.resize import resize_bilinear

    sample = sharded_sampler(cfg, g_params, g_state, ndim=2, mesh=mesh,
                             z_tail=z_tail)
    model = InceptionV3([InceptionV3.BLOCK_INDEX_BY_DIM[dims]])
    stats = _per_sample_stats
    real_stats = []  # computed once, at the ACTUAL fake output size

    def run(num_samples: int, key, return_samples: int = 0):
        fakes = sample(num_samples, key, device=True)  # [-1,1] device array
        mu_f, sig_f = stats(model((fakes + 1.0) * 0.5)[-1])
        mu_f, sig_f = to_host((mu_f, sig_f))  # tiny transfer, ONE gather

        if not real_stats:
            h, w = fakes.shape[1], fakes.shape[2]
            real = jnp.asarray(real_image, jnp.float32)[None]
            real = resize_bilinear(real, (h, w), align_corners=False)
            mu_r, sig_r = stats(model(real)[-1])
            real_stats.append((np.asarray(mu_r)[0], np.asarray(sig_r)[0]))
        mu_r, sig_r = real_stats[0]
        vals = [float(calculate_frechet_distance(mu_f[i], sig_f[i],
                                                 mu_r, sig_r))
                for i in range(num_samples)]
        if return_samples:
            return vals, to_host(fakes[:min(return_samples, num_samples)])
        return vals

    return run


def sampled_sifid(cfg, g_params, g_state, real_image, num_samples: int, key,
                  mesh=None, dims: int = 64, z_tail=None,
                  return_samples: int = 0):
    """One-shot wrapper around make_sampled_sifid."""
    return make_sampled_sifid(cfg, g_params, g_state, real_image, mesh=mesh,
                              dims=dims, z_tail=z_tail)(
                                  num_samples, key,
                                  return_samples=return_samples)


def make_sampled_svfid(cfg, g_params, g_state, real_video, mesh=None,
                       dims: int = 64, z_tail=None):
    """Video variant of make_sampled_sifid (BASELINE config 5: batched
    diverse-sample VIDEO generation with on-device sinFID): samples and C3D
    block features stay on device; per-sample statistics are the only
    transfer. Returns run(num_samples, key) -> list[float].

    real_video: (T, H, W, 3) float in [0,1].
    """
    from ..metrics.c3d import C3D
    from ..metrics.fid import calculate_frechet_distance
    from ..ops.resize import resize_trilinear

    sample = sharded_sampler(cfg, g_params, g_state, ndim=3, mesh=mesh,
                             z_tail=z_tail)
    model = C3D([C3D.BLOCK_INDEX_BY_DIM[dims]])
    stats = _per_sample_stats
    real_stats = []

    def run(num_samples: int, key, return_samples: int = 0):
        fakes = sample(num_samples, key, device=True)  # (B,T,H,W,C) [-1,1]
        mu_f, sig_f = stats(model((fakes + 1.0) * 0.5)[-1])
        mu_f, sig_f = to_host((mu_f, sig_f))  # ONE gather

        if not real_stats:
            t, h, w = fakes.shape[1:4]
            real = jnp.asarray(real_video, jnp.float32)[None]
            real = resize_trilinear(real, (t, h, w), align_corners=False)
            mu_r, sig_r = stats(model(real)[-1])
            real_stats.append((np.asarray(mu_r)[0], np.asarray(sig_r)[0]))
        mu_r, sig_r = real_stats[0]
        vals = [float(calculate_frechet_distance(mu_f[i], sig_f[i],
                                                 mu_r, sig_r))
                for i in range(num_samples)]
        if return_samples:
            return vals, to_host(fakes[:min(return_samples, num_samples)])
        return vals

    return run


def sampled_svfid(cfg, g_params, g_state, real_video, num_samples: int, key,
                  mesh=None, dims: int = 64, z_tail=None,
                  return_samples: int = 0):
    """One-shot wrapper around make_sampled_svfid."""
    return make_sampled_svfid(cfg, g_params, g_state, real_video, mesh=mesh,
                              dims=dims, z_tail=z_tail)(
                                  num_samples, key,
                                  return_samples=return_samples)
