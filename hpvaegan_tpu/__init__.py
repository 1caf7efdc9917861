"""hpvaegan_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
SakiRinn/mindspore-hp-vae-gan (Hierarchical Patch VAE-GAN).

This is NOT a port of the MindSpore reference: the compute path is pure-functional
JAX (explicit pytree params, explicit PRNG keys, per-scale jitted train steps,
align-corners resizes expressed as MXU matmuls), scaling is done with
jax.sharding meshes, and export targets StableHLO instead of MindIR.

Layout:
  config.py       typed config (CLI-flag parity with the reference argparse surface)
  utils/          pyramid scale math, noise, saver, logger, progress, media export
  ops/            resize kernels, conv wrappers, batchnorm, spectral norm, pallas
  models/         2D/3D generators, encoders, discriminators (+ SinGAN baselines)
  losses.py       KL, WGAN-GP, VAE/GAN generator losses
  optim.py        per-tensor-clipped Adam with per-block LR groups
  training/       train state, jitted steps, the multi-scale loop
  data/           single-image / single-video pipelines (decode once, resize on-device)
  metrics/        sinFID (SIFID/SVFID): InceptionV3 / C3D features + Frechet distance
  parallel/       device mesh + sharding helpers (DP batch, optional spatial CP)
  export/         StableHLO export for native serving
"""

__version__ = "0.1.0"


def _enable_persistent_compilation_cache():
    """Per-scale programs recompile identically across runs (SURVEY §7 'hard
    parts': per-scale shape polymorphism). A persistent on-disk cache makes
    re-runs and resumes pay compile cost once per (scale, shape) ever.
    Override the location with JAX_COMPILATION_CACHE_DIR; disable by setting
    it to empty."""
    import os

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/hpvaegan_jax"))
    if not cache_dir:
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


def _honor_platform_request():
    """Make `JAX_PLATFORMS=cpu <cli>` actually mean CPU. This environment's
    sitecustomize registers the 'axon' TPU plugin at interpreter start and
    sets jax.config.jax_platforms = "axon,cpu" — and jax CONFIG beats the
    ENV VAR, so `JAX_PLATFORMS=cpu <cli>` silently lands on the TPU
    (observed: the "CPU" run then contends with a live TPU training run
    through the shared tunnel). Re-assert the env request into the config;
    if a non-matching backend was already initialized, clear and re-resolve
    (same move as tests/conftest.py)."""
    import os

    want = os.environ.get("JAX_PLATFORMS", "")
    if not want:
        return
    try:
        import jax
        from jax._src import xla_bridge

        if jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)
            # any backend state resolved under the OLD platform list is
            # stale (e.g. "axon,cpu" initializes BOTH, and axon stays the
            # default even after the config update) — clear and re-resolve
            if xla_bridge._backends:
                xla_bridge._clear_backends()
    except Exception:  # pragma: no cover - private API, best-effort
        pass


_enable_persistent_compilation_cache()
_honor_platform_request()
