"""SinGAN-style video baselines trainer (GeneratorCSG / GeneratorSG).

Reference: train_video_baselines.py:21-196 — pure GAN at every scale (no VAE
phase), a FIXED Z_init noise map for the reconstruction path, per-block
freeze of all but the last train_depth stages (:66-68), head trained while
scale_idx < train_depth, tail always trained (:77-83). The reference driver
is broken as shipped (a PyTorch `.to(opt.device)` leftover at :340 and a
loss cell that indexes VAE outputs the baselines don't produce); this is the
working TPU-native equivalent. Z_init is persisted to the experiment dir so
resume/eval reproduce the reconstruction path (the reference kept it only in
memory).

Shares the main trainer's machinery: fused lax.scan iteration chunks
(steps.make_train_chunk — one XLA dispatch per steps_per_call iterations),
elastic scale retry with split-step fallback, and optional
data/spatial-parallel mesh sharding.
"""

from __future__ import annotations

import logging
import os
import time
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from .. import models
from ..data.video import SingleVideoDataset, make_video_batch_body
from ..models import networks_3d
from ..optim import adam, clipped_adam
from ..utils import pyramid
from ..utils.progress import create_progressbar
from ..utils.saver import DataSaver
from .partition import lr_tree_for, make_baseline_lr_plan, split_params
from .state import ScaleTrainState
from .steps import (make_calibration, make_d_step, make_g_step,
                    make_train_chunk)
from .trainer import _amps_array, run_scale_with_retry

_NEXT_STAGE = {
    "GeneratorCSG": networks_3d.generator_csg_next_stage,
    "GeneratorSG": networks_3d.generator_sg_next_stage,
}


def make_baseline_g_apply(base_apply, z_init):
    """Adapt a baseline generator (noise-in only) to the hierarchical apply
    signature used by the shared step builders: reconstruction mode feeds the
    fixed Z_init; random mode feeds the provided noise."""

    def g_apply(cfg, params, state, *, video=None, amps, noise_init=None,
                sample_init=None, key, is_random=False, train=False,
                compute_dtype=None):
        if is_random:
            z = noise_init
        else:
            b = video.shape[0] if video is not None else z_init.shape[0]
            z = jnp.broadcast_to(z_init, (b,) + z_init.shape[1:])
        out, new_state = base_apply(cfg, params, state, noise_init=z,
                                    amps=amps, key=key, is_random=is_random,
                                    train=train, compute_dtype=compute_dtype)
        x = out[0]
        return (x, x, None, None), new_state

    return g_apply


def make_baseline_batch_body(cfg, scale_idx: int, z_tail):
    """Batch former for baselines: real windows from the video pipeline,
    noise at Z_init's shape with nc_im channels
    (train_video_baselines.py:124)."""
    inner = make_video_batch_body(cfg, scale_idx)
    batch = cfg.batch_size

    def body(data_scale, data_zero, key):
        k_inner, k_noise = jax.random.split(key)
        real, real_zero, _ = inner(data_scale, data_zero, k_inner)
        noise_init = jax.random.normal(k_noise, (batch,) + tuple(z_tail))
        return real, real_zero, noise_init

    return body


def _train_baseline_scale(cfg, g_apply, d_apply, d_init, dataset, saver,
                          noise_amps: List[float], z_init, g_params, g_state,
                          key, step_callback=None, split_steps: bool = False,
                          mesh=None, resumed_idx: int = -1,
                          resume_dir: str = "", inflight=None):
    """One baseline scale; returns (g_params, g_state, noise_amps, key).

    inflight: optional mid-scale resume payload (--ckpt-interval), same
    contract as trainer.train_scale — skips D init, optimizer init, and
    amp calibration, continuing bit-exactly from the saved iteration."""
    scale_idx = cfg.scale_idx

    # fresh D, warm-started from the previous scale (baselines warm-start
    # at EVERY scale > 0, train_video_baselines.py:51-54); on a resumed run
    # the previous scale's netD lives in the ORIGINAL experiment dir
    # (reference: opt.resume_dir, train_video_baselines.py:53)
    d_params = d_state = None
    if inflight is None:
        key, kd = jax.random.split(key)
        d_params, d_state = d_init(cfg, kd)
        if scale_idx > 0:
            loaded = 1.0
            try:
                path = resume_dir if (resumed_idx == scale_idx
                                      and resume_dir) else None
                ckpt = saver.load_checkpoint(f"netD_{scale_idx - 1}.ckpt",
                                             path=path)
            except FileNotFoundError:
                loaded = 0.0
            # multi-process: the warm-start must be SYMMETRIC — if the ckpt
            # is visible on some processes only (no shared FS view), a
            # warning-and-continue would desync replica d_params and the
            # "identical replicated program" silently trains corrupted.
            # min/max over an allgather so EVERY process (including the
            # primary) raises and the job aborts cleanly instead of
            # hanging at the next collective
            from ..parallel import multihost
            lo, hi = multihost.agree_minmax(loaded)
            if lo != hi:
                raise RuntimeError(
                    f"netD_{scale_idx - 1}.ckpt visible on only some "
                    "processes — multi-process baselines need a shared "
                    "filesystem view of the experiment dir")
            if loaded:
                d_params, d_state = ckpt["params"], ckpt["state"]
            else:
                logging.warning("no previous netD checkpoint to warm-start "
                                "from")

    plan = make_baseline_lr_plan(cfg, scale_idx, len(g_params["body"]),
                                 has_head="head" in g_params,
                                 has_tail="tail" in g_params)
    trainable, _ = split_params(g_params, plan)
    # baselines use plain (unclipped) Adam for G too
    # (train_video_baselines.py:85)
    opt_g = clipped_adam(lr_tree_for(trainable, plan), cfg.beta1,
                         grad_clip=float("inf"), flat=cfg.flat_opt)
    opt_d = adam(cfg.lr_d, cfg.beta1, flat=cfg.flat_opt)

    batch_body = make_baseline_batch_body(cfg, scale_idx, z_init.shape[1:])
    batch_fn = jax.jit(batch_body)
    data_scale = dataset.scale_frames(scale_idx)
    data_zero = dataset.scale_frames(0)

    if split_steps:
        g_step = make_g_step(cfg, g_apply, d_apply, opt_g, plan,
                             vae_phase=False, mesh=mesh)
        d_step = make_d_step(cfg, g_apply, d_apply, opt_d, mesh=mesh)
        spc = 1
        chunk = chunk_rem = None
    else:
        spc = max(1, min(cfg.steps_per_call, cfg.niter))
        chunk = make_train_chunk(cfg, g_apply, d_apply, opt_g, opt_d, plan,
                                 False, batch_body, spc, mesh=mesh)
        rem = cfg.niter % spc
        chunk_rem = None
        if rem:
            chunk_rem = make_train_chunk(cfg, g_apply, d_apply, opt_g, opt_d,
                                         plan, False, batch_body, rem,
                                         mesh=mesh)

    if inflight is None:
        key, ks = jax.random.split(key)
        state = ScaleTrainState(g_params, g_state, d_params, d_state,
                                opt_g.init(trainable), opt_d.init(d_params),
                                ks)
    else:
        state = jax.tree_util.tree_map(jnp.asarray, inflight["state"])
        key = jnp.asarray(inflight["key"])
    if mesh is not None:
        from ..parallel.mesh import replicate_sharding
        state = jax.device_put(state, replicate_sharding(mesh))

    # noise-amp calibration: one host scalar per scale
    # (train_video_baselines.py:104-117)
    if inflight is not None:
        assert len(noise_amps) == scale_idx + 1, (len(noise_amps), scale_idx)
    elif scale_idx == 0:
        noise_amps.append(1.0)
    else:
        noise_amps.append(0.0)
        calib = make_calibration(cfg, g_apply)
        key, kb, kc = jax.random.split(key, 3)
        real, real_zero, _ = batch_fn(data_scale, data_zero, kb)
        rmse = calib(state.g_params, state.g_state, real, real_zero,
                     _amps_array(noise_amps, cfg.stop_scale), kc)
        # batch-invariant amp by default; --bug-compat restores the
        # reference's extra /batch_size on the batch-mean RMSE (bug #3,
        # see trainer.py — reference train_video_baselines.py:140)
        denom = cfg.batch_size if cfg.bug_compat else 1
        noise_amps[-1] = cfg.noise_amp_init * float(rmse) / denom
    amps = _amps_array(noise_amps, cfg.stop_scale)

    start_iter = int(inflight["iter"]) if inflight is not None else 0
    if start_iter % spc != 0:
        raise ValueError(
            f"inflight iteration {start_iter} is not a multiple of "
            f"steps_per_call={spc}; resume with the original "
            f"--steps-per-call (or one that divides {start_iter})")
    from ..parallel import multihost as _mh
    bar = create_progressbar(total=cfg.niter, initial=start_iter,
                             desc=f"Training scale [{scale_idx + 1}/"
                                  f"{cfg.stop_scale + 1}]",
                             disable=not _mh.is_primary())
    t0 = time.time()
    metrics = {}
    for iteration in range(start_iter, cfg.niter, spc):
        if split_steps:
            key, kb = jax.random.split(key)
            real, real_zero, noise_init = batch_fn(data_scale, data_zero, kb)
            state, d_metrics = d_step(state, real, noise_init, amps)
            state, metrics = g_step(state, real, real_zero, noise_init, amps)
            metrics.update(d_metrics)
        else:
            this_chunk = chunk if iteration + spc <= cfg.niter else chunk_rem
            state, metrics = this_chunk(state, data_scale, data_zero, amps)
        done = min(iteration + spc, cfg.niter)
        bar.update(done - iteration)

        if done % cfg.print_interval < spc:
            vals = {k: float(v) for k, v in metrics.items()}
            bad = [k for k, v in vals.items() if not np.isfinite(v)]
            if bad:
                raise RuntimeError(
                    f"non-finite training metrics {bad} at scale "
                    f"{scale_idx} iter {done} (amps={noise_amps})")
            logging.logbook("[Scale {}/Iter {}] {}".format(
                scale_idx + 1, done,
                ", ".join(f"{k}: {v:.5f}" for k, v in sorted(vals.items()))))

        # mid-scale checkpoint (--ckpt-interval); crash ordering in
        # saver.save_inflight
        if (cfg.ckpt_interval and done < cfg.niter and done % spc == 0
                and done % cfg.ckpt_interval < spc):
            saver.save_inflight(scale_idx, state, key, done, noise_amps)

        if step_callback is not None:
            step_callback(done, state, metrics)
    bar.close()
    logging.info("scale %d done in %.1fs", scale_idx, time.time() - t0)

    saver.finalize_scale(
        scale_idx, noise_amps,
        {"params": state.g_params, "state": state.g_state},
        {"params": state.d_params, "state": state.d_state},
        key=key)
    # multi-process: the NEXT scale's netD warm-start reads this scale's
    # just-written checkpoint from the shared FS — barrier here so a
    # non-primary can't race ahead of the primary's write and turn a
    # visibility lag into a spurious symmetry abort
    from ..parallel import multihost
    multihost.sync(f"baselines_scale_{scale_idx}_finalized")
    return state.g_params, state.g_state, noise_amps, key


def run_training(cfg, seed: int = 0, step_callback=None):
    """Full multi-scale baseline run. Returns (g_params, g_state, amps, saver)."""
    from ..parallel.mesh import select_device
    select_device(cfg.device_id)

    # multi-process: primary owns all writes (see trainer.run_training);
    # non-primary NullSavers still READ the shared experiment dir for the
    # per-scale netD warm-start below
    from ..parallel import multihost
    saver = multihost.select_saver(
        cfg, lambda: getattr(cfg, "saver", None) or DataSaver(cfg))
    cfg.saver = saver
    dataset = SingleVideoDataset(cfg)
    # re-persist args.txt after the dataset computed ar/org_fps/fps_lcm
    # (eval re-hydrates geometry from it)
    if multihost.is_primary():
        cfg.write_args_txt(os.path.join(saver.experiment_dir, "args.txt"))

    key = jax.random.PRNGKey(seed)
    key, kg, kz = jax.random.split(key, 3)
    g_init, base_apply = models.get_generator(cfg.generator, 3)
    next_stage = _NEXT_STAGE[cfg.generator]
    g_params, g_state = g_init(cfg, kg)
    d_init, d_apply = models.get_discriminator(cfg.discriminator, 3)

    mesh = None
    if cfg.mesh_data > 1 or cfg.mesh_sp > 1:
        from ..parallel.mesh import make_mesh
        assert cfg.batch_size % cfg.mesh_data == 0, \
            f"batch {cfg.batch_size} not divisible by mesh_data {cfg.mesh_data}"
        mesh = make_mesh(cfg.mesh_data * cfg.mesh_sp,
                         data_parallel=cfg.mesh_data)

    noise_amps: List[float] = []
    cfg.scale_idx = 0
    resumed_idx, resume_dir = -1, ""
    inflight_payload = None
    z_init = None

    # --- resume (reference: train_video_baselines.py:342-360 --netG +
    # --intermediate; the reference re-randomizes Z_init on resume, which
    # silently changes the reconstruction target — here the persisted
    # Z_init.npy is reloaded so the resumed run continues the same one)
    if cfg.netG:
        import json
        inter_dir = os.path.dirname(cfg.intermediate)
        with open(os.path.join(inter_dir, "intermediate.json")) as f:
            inter = json.load(f)
        noise_amps = list(inter["noise_amps"])
        cfg.scale_idx = resumed_idx = int(inter["scale_idx"])
        resume_dir = os.path.dirname(cfg.netG)
        from ..utils.saver import load_pytree
        ckpt = load_pytree(cfg.netG)
        z_init = jnp.asarray(np.load(os.path.join(resume_dir, "Z_init.npy")))
        if inter.get("inflight") \
                and os.path.basename(cfg.netG) == inter["inflight"]:
            inflight_payload = {"state": ckpt["state"], "key": ckpt["key"],
                                "iter": int(ckpt["iter"])}
            g_params = ckpt["state"].g_params
            g_state = ckpt["state"].g_state
            assert len(noise_amps) == cfg.scale_idx + 1, \
                (len(noise_amps), cfg.scale_idx)
        elif "key" in inter:
            # our finalize markers carry the end-of-scale outer PRNG key:
            # scale_idx is COMPLETE — continue at the NEXT scale bit-exactly
            # instead of retraining it from its own trained params (the
            # reference's keyless-marker semantics, kept in the branch
            # below; see trainer.run_training for the full rationale)
            g_params, g_state = ckpt["params"], ckpt["state"]
            assert len(noise_amps) == cfg.scale_idx + 1, \
                (len(noise_amps), cfg.scale_idx)
            key = jnp.asarray(inter["key"], dtype=jnp.uint32)
            src = os.path.join(resume_dir, f"netD_{cfg.scale_idx}.ckpt")
            dst = os.path.join(saver.experiment_dir,
                               f"netD_{cfg.scale_idx}.ckpt")
            if multihost.is_primary() and os.path.isfile(src) \
                    and not os.path.exists(dst):
                import shutil
                shutil.copy(src, dst)
            multihost.sync("baselines_resume_netd_copy")
            cfg.scale_idx += 1
            resumed_idx, resume_dir = -1, ""
            if cfg.scale_idx > cfg.stop_scale:
                logging.info("resume: all %d scales already complete — "
                             "nothing to train", cfg.stop_scale + 1)
        else:
            g_params, g_state = ckpt["params"], ckpt["state"]
            noise_amps = noise_amps[:cfg.scale_idx]

    # fixed Z_init at scale-0 size with nc_im channels
    # (train_video_baselines.py:41-44)
    if z_init is None:
        h0, w0 = pyramid.scale_size_2d(0, cfg.scale_factor, cfg.stop_scale,
                                       cfg.img_size, cfg.ar)
        _, td0, _ = pyramid.get_fps_td_by_index(0, cfg.stop_scale_time,
                                                cfg.sampling_rates,
                                                cfg.org_fps, cfg.fps_lcm)
        z_init = jax.random.normal(kz, (1, td0, h0, w0, cfg.nc_im))
    # atomic like every other resume artifact: Z_init IS the reconstruction
    # target, and a supervisor kill during startup must not truncate it
    # (identical on every process — same seed, same draw — so primary-only)
    if multihost.is_primary():
        _z_dst = os.path.join(saver.experiment_dir, "Z_init.npy")
        np.save(_z_dst + ".tmp.npy", np.asarray(z_init))
        os.replace(_z_dst + ".tmp.npy", _z_dst)
    g_apply = make_baseline_g_apply(base_apply, z_init)

    while cfg.scale_idx < cfg.stop_scale + 1:
        scale_idx = cfg.scale_idx
        if scale_idx > 0 and resumed_idx != scale_idx:
            g_params, g_state = next_stage(cfg, g_params, g_state)
        fps, td, fps_index = pyramid.get_fps_td_by_index(
            scale_idx, cfg.stop_scale_time, cfg.sampling_rates, cfg.org_fps,
            cfg.fps_lcm)
        cfg.fps, cfg.td, cfg.fps_index = fps, td, fps_index

        amps_in = list(noise_amps)
        inflight = inflight_payload
        inflight_payload = None

        def train_fn(gp, gs, k, split_steps, _inflight=inflight):
            return _train_baseline_scale(
                cfg, g_apply, d_apply, d_init, dataset, saver, list(amps_in),
                z_init, gp, gs, k, step_callback=step_callback,
                split_steps=split_steps, mesh=mesh, resumed_idx=resumed_idx,
                resume_dir=resume_dir, inflight=_inflight)

        g_params, g_state, noise_amps, key = run_scale_with_retry(
            train_fn, cfg, g_params, g_state, key)
        cfg.scale_idx += 1

    multihost.sync("baselines_run_training_end")
    return g_params, g_state, noise_amps, saver
