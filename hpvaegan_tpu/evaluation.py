"""Shared evaluation logic for eval_image.py / eval_video.py CLIs.

Reference flow (eval_image.py:24-76, eval_video.py:23-85): hydrate the config
from args.txt, rebuild G at the saved scale, generate niter x num_samples
random samples, dump random_samples.npy, derive PNGs/GIFs, compute sinFID.
TPU-native: samples are generated in ONE batched jitted forward per iteration
instead of a Python loop over single samples (eval_image.py:54-61)."""

from __future__ import annotations

import glob
import json
import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import models
from .config import Config
from .parallel import multihost
from .utils import pyramid
from .utils.saver import DataSaver, load_pytree, resolve_finalized_scale


def hydrate_config(exp_dir: str, overrides: dict,
                   exceptions=("niter", "data_rep", "batch_size", "netG",
                               "scale_idx")) -> Config:
    """Rebuild the Config from the experiment's args.txt
    (reference eval_image.py:122-132)."""
    cfg = Config.from_args_txt(os.path.join(exp_dir, "args.txt"),
                               exceptions=list(exceptions))
    for k, v in overrides.items():
        setattr(cfg, k, v)
    cfg.experiment_dir = exp_dir
    return cfg


def load_generator(cfg, exp_dir: str, ndim: int, netG: str = ""):
    """Load netG at the saved scale (reference eval_image.py:154-177)."""
    saver = DataSaver(cfg)
    inter = saver.load_json("intermediate.json", path=exp_dir)
    if cfg.scale_idx == -1:
        # an inflight (--ckpt-interval) marker resolves to the last
        # FINALIZED scale — shared contract with preprocess/postprocess
        cfg.scale_idx = resolve_finalized_scale(inter, what="evaluate")
    cfg.Noise_Amps = inter["noise_amps"][:cfg.scale_idx + 1]

    path = netG or os.path.join(exp_dir, f"netG_{cfg.scale_idx}.ckpt")
    if not os.path.isfile(path):
        raise RuntimeError(f"=> no <G> checkpoint found at '{path}'")
    if path.endswith(".pth"):
        # original PyTorch HP-VAE-GAN checkpoint (reference
        # eval_image.py:157-162 via pt2ms)
        from .tools.convert import (load_intermediate, load_torch_checkpoint,
                                    p2j_HPVAEGAN)
        raw = load_torch_checkpoint(path)
        inter = load_intermediate(raw)
        cfg.scale_idx = inter["scale_idx"]
        cfg.Noise_Amps = inter["noise_amps"][:cfg.scale_idx + 1]
        params, state = p2j_HPVAEGAN(raw, ndim=ndim)
        _check_body(params, cfg, path)
        return params, state, saver
    from .tools.ms_ckpt import is_ms_checkpoint, load_ms_checkpoint
    if is_ms_checkpoint(path):
        # MindSpore-saved generator (reference eval_image.py:163-165's m2m
        # path); .ckpt is also this framework's own suffix, so dispatch is
        # by file content, not extension
        from .tools.convert import m2j_HPVAEGAN
        params, state = m2j_HPVAEGAN(load_ms_checkpoint(path), ndim=ndim)
        _check_body(params, cfg, path)
        return params, state, saver
    ckpt = load_pytree(path)
    _check_body(ckpt["params"], cfg, path)
    return ckpt["params"], ckpt["state"], saver


def _check_body(params, cfg, path: str) -> None:
    """A stage-count/scale mismatch must fail loudly: the per-stage amp
    lookup is a jnp gather, and an out-of-range index CLAMPS silently
    instead of erroring (the reference fails at load_param_into_net).
    HPVAEGAN family only — the CSG/SG baselines' 'body' holds conv layers,
    not per-scale stages."""
    if cfg.generator not in ("GeneratorHPVAEGAN", "GeneratorVAE_nb"):
        return
    if len(params["body"]) != cfg.scale_idx:
        raise RuntimeError(
            f"checkpoint {path!r} has {len(params['body'])} refinement "
            f"stages but intermediate.json says scale_idx={cfg.scale_idx} "
            f"(expected {cfg.scale_idx} stages — netG_<k>.ckpt carries k)")


def eval_mesh(cfg):
    """('data','sp') mesh for sharded eval when --mesh-data > 1, else None.

    Multi-process runs ALWAYS get a mesh spanning all global devices: the
    fallback make_mesh(1) inside generate_samples would pin everything to
    global device 0, which non-primary processes cannot address."""
    from .parallel import multihost
    if getattr(cfg, "mesh_data", 1) and cfg.mesh_data > 1:
        from .parallel.mesh import make_mesh
        return make_mesh(cfg.mesh_data, data_parallel=cfg.mesh_data)
    if multihost.is_multiprocess():
        from .parallel.mesh import make_mesh
        return make_mesh()
    return None


def eval_z_tail(cfg, ndim: int):
    """Per-sample noise shape for eval-time generation (the reference
    semantics: eval_video builds Z_init at the EVAL scale's time depth,
    eval_video.py:36-39; baselines keep their nc_im-channel Z_init)."""
    h0, w0 = pyramid.scale_size_2d(0, cfg.scale_factor, cfg.stop_scale,
                                   cfg.img_size, cfg.ar)
    baseline = cfg.generator in ("GeneratorCSG", "GeneratorSG")
    z_ch = cfg.nc_im if baseline else cfg.latent_dim
    if ndim == 2:
        return (h0, w0, z_ch)
    if baseline:
        _, td, _ = pyramid.get_fps_td_by_index(
            0, cfg.stop_scale_time, cfg.sampling_rates, cfg.org_fps,
            cfg.fps_lcm)
    else:
        td = getattr(cfg, "td", None)
        if not td:
            _, td, _ = pyramid.get_fps_td_by_index(
                cfg.scale_idx, cfg.stop_scale_time, cfg.sampling_rates,
                cfg.org_fps, cfg.fps_lcm)
    return (td, h0, w0, z_ch)


def generate_samples(cfg, g_params, g_state, ndim: int, seed: int = 0,
                     train_mode: bool = True, mesh=None) -> np.ndarray:
    """niter batches of num_samples random samples; returns channels-last
    (N, ..., C) in [-1, 1].

    Routes through parallel.sampling.sharded_sampler (noise formed in-jit,
    batch sharded over 'data' when a mesh is given, trivially on one device
    otherwise). Samples stay device-resident across iterations — ONE host
    transfer at the end, not the per-iteration d2h the reference's sample
    loop implies (eval_image.py:54-61). train_mode=True (default) samples
    with per-sample batch-statistics BN, matching the reference eval's
    never-set_train(False) cells — see sharded_sampler's docstring."""
    from .parallel.mesh import make_mesh
    from .parallel.sampling import sharded_sampler

    z_tail = eval_z_tail(cfg, ndim)
    key = jax.random.PRNGKey(seed)
    if mesh is None:
        mesh = make_mesh(1)
    sample = sharded_sampler(cfg, g_params, g_state, ndim=ndim, mesh=mesh,
                             train=train_mode, z_tail=z_tail)
    outs = []
    for _ in range(cfg.niter):
        key, ks = jax.random.split(key)
        outs.append(sample(cfg.num_samples, ks, device=True))
    # multi-process: the batch is sharded across processes — to_host
    # allgathers so every process gets the identical full set
    return multihost.to_host(jnp.concatenate(outs, axis=0))


def _persist_eval_metrics(saver, cfg, metric: str, value: float) -> None:
    """Record the eval score as eval/metrics.json (primary-only, atomic).

    The reference only PRINTS its FID (eval_image.py:193); persisting it
    next to the samples makes experiments comparable after the fact —
    scripts/compare_runs.py reads this for lever-qualification A/Bs (the
    round-3 bf16/fused-dg methodology, docs/PERF.md)."""
    if not multihost.is_primary():
        return
    import datetime
    saver.save_json({
        "metric": metric,
        "value": value,
        "num_samples": cfg.niter * cfg.num_samples,
        "scale_idx": cfg.scale_idx,
        "netG": getattr(cfg, "netG", "") or "",
        "on_device_fid": bool(getattr(cfg, "on_device_fid", False)),
        "date": datetime.datetime.now().isoformat(timespec="seconds"),
    }, os.path.join("eval", "metrics.json"))


def eval_image_experiment(cfg, exp_dir: str, seed: int = 0):
    """One experiment dir: samples -> npy -> PNGs -> SIFID
    (reference eval_image.py:179-190).

    With --on-device-fid, samples and Inception features never leave the
    device; only per-sample (mu, sigma) stats transfer for the tiny Frechet
    sqrtm (BASELINE config 5 end-to-end from the CLI)."""
    from .metrics import calculate_SIFID
    from .utils.media import generate_images

    g_params, g_state, saver = load_generator(cfg, exp_dir, ndim=2,
                                              netG=cfg.netG)
    mesh = eval_mesh(cfg)
    if getattr(cfg, "on_device_fid", False):
        from .data.image import load_image01
        from .parallel.sampling import sampled_sifid

        real01 = load_image01(cfg.image_path)
        total = cfg.niter * cfg.num_samples
        # FID statistics stay device-resident; only the first max_samples
        # samples transfer (a small d2h) so the fast path keeps the
        # reference's artifact contract (eval_image.py:179-190)
        vals, firstk = sampled_sifid(cfg, g_params, g_state, real01, total,
                                     jax.random.PRNGKey(seed), mesh=mesh,
                                     z_tail=eval_z_tail(cfg, 2),
                                     return_samples=min(cfg.max_samples,
                                                        total))
        if multihost.is_primary():
            np.save(os.path.join(saver.eval_dir, "random_samples.npy"),
                    firstk.transpose(0, 3, 1, 2))  # (N, C, H, W)
            generate_images(cfg, saver)
        sifid = float(np.mean(vals))
        logging.info("SIFID (on-device): %s", sifid)
        _persist_eval_metrics(saver, cfg, "SIFID", sifid)
        # non-primary must not exit while the primary still writes PNGs
        # (pod launchers commonly reap all processes on first exit)
        multihost.sync("eval_image_artifacts")
        return sifid, saver
    samples = generate_samples(cfg, g_params, g_state, ndim=2, seed=seed,
                               mesh=mesh)
    # reference artifact layout: (N, C, H, W); one writer, and a barrier so
    # non-primary processes read the PNGs only after they exist (shared FS)
    # the trained image FILE, not its directory: sibling images would
    # sort into the real set and pair with every fake (fid.py pairing)
    real_dir = os.path.abspath(cfg.image_path)
    fake_dir = os.path.join(saver.eval_dir, cfg.save_path)
    sifid = 0.0
    if multihost.is_primary():
        np.save(os.path.join(saver.eval_dir, "random_samples.npy"),
                samples.transpose(0, 3, 1, 2))
        generate_images(cfg, saver)
        # disk-read FID on the primary only (non-primary may have no shared
        # FS view of the PNGs); the broadcast shares the scalar AND is the
        # barrier that keeps a straggler-killing launcher off the writer
        sifid = calculate_SIFID(real_dir, fake_dir)
        # persist BEFORE the agree_float barrier: it is the last sync in
        # this path, and a straggler-killing pod launcher may reap the
        # primary right after the non-primaries return from it
        _persist_eval_metrics(saver, cfg, "SIFID", sifid)
    sifid = multihost.agree_float(sifid)
    logging.info("SIFID: %s", sifid)
    return sifid, saver


def eval_video_experiment(cfg, exp_dir: str, seed: int = 0):
    """One experiment dir: samples -> npy -> GIFs -> SVFID
    (reference eval_video.py:23-85, 185-193)."""
    from .data.video import SingleVideoDataset
    from .metrics import calculate_SVFID
    from .utils.media import generate_gifs

    dataset = SingleVideoDataset(cfg)
    g_params, g_state, saver = load_generator(cfg, exp_dir, ndim=3,
                                              netG=cfg.netG)
    fps, td, fps_index = pyramid.get_fps_td_by_index(
        cfg.scale_idx, cfg.stop_scale_time, cfg.sampling_rates, cfg.org_fps,
        cfg.fps_lcm)
    cfg.fps, cfg.td, cfg.fps_index = fps, td, fps_index

    # real_full_scale.npy: (T, H, W, C) uint8 at the saved scale
    frames = np.asarray(dataset.scale_frames(cfg.scale_idx))[0]
    if multihost.is_primary():
        np.save(os.path.join(saver.eval_dir, "real_full_scale.npy"),
                (frames * 255).astype(np.uint8))

    mesh = eval_mesh(cfg)
    if getattr(cfg, "on_device_fid", False):
        from .parallel.sampling import sampled_svfid

        # the real WINDOW at this scale's sampling rate (data/video.py
        # window rule: frames[0 : fps_lcm+1 : every], length td) — NOT all
        # full-rate frames, which sampled_svfid would temporally resize
        # (blending adjacent frames the model never saw)
        window = frames[:cfg.fps_lcm + 1:cfg.sampling_rates[fps_index]]
        total = cfg.niter * cfg.num_samples
        # keep the reference's artifact contract in the fast path: the FID
        # stats stay on device, the first max_samples samples d2h for
        # random_samples.npy + GIFs (extract.py:28-83)
        vals, firstk = sampled_svfid(cfg, g_params, g_state, window, total,
                                     jax.random.PRNGKey(seed), mesh=mesh,
                                     z_tail=eval_z_tail(cfg, 3),
                                     return_samples=min(cfg.max_samples,
                                                        total))
        if multihost.is_primary():
            np.save(os.path.join(saver.eval_dir, "random_samples.npy"),
                    firstk.transpose(0, 4, 1, 2, 3))  # (N, C, T, H, W)
            generate_gifs(cfg, saver)
        svfid = float(np.mean(vals))
        logging.info("SVFID (on-device): %s", svfid)
        _persist_eval_metrics(saver, cfg, "SVFID", svfid)
        multihost.sync("eval_video_artifacts")
        return svfid, saver

    samples = generate_samples(cfg, g_params, g_state, ndim=3, seed=seed,
                               mesh=mesh)
    # reference artifact layout: (N, C, T, H, W); SVFID below is computed
    # from the in-memory arrays (identical on every process), so only the
    # artifact writes need gating
    if multihost.is_primary():
        np.save(os.path.join(saver.eval_dir, "random_samples.npy"),
                samples.transpose(0, 4, 1, 2, 3))
        generate_gifs(cfg, saver)

    # SVFID over video arrays (the reference image-file path was broken);
    # real side is the strided window at this scale's rate, matching what
    # the model was trained on (not the first td full-rate frames)
    from .metrics.fid import svfid_arrays
    window = frames[:cfg.fps_lcm + 1:cfg.sampling_rates[fps_index]]
    reals = window[None] + 0.0
    fakes = (samples + 1) / 2
    t = min(reals.shape[1], fakes.shape[1])
    h = min(reals.shape[2], fakes.shape[2])
    w = min(reals.shape[3], fakes.shape[3])
    svfid = float(np.mean(svfid_arrays(reals[:, :t, :h, :w],
                                       fakes[:, :t, :h, :w])))
    logging.info("SVFID: %s", svfid)
    _persist_eval_metrics(saver, cfg, "SVFID", svfid)
    multihost.sync("eval_video_artifacts")
    return svfid, saver


def iter_experiment_dirs(pattern: str):
    return sorted(glob.glob(pattern))
