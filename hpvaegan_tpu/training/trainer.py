"""The multi-scale training loop (image + video).

Re-expresses the reference drivers' scale loop (train_image.py:22-210,385-391;
train_video.py:22-227,413-419) TPU-first:
  * per-scale jitted D/G steps (static shapes; <= 2*(stop_scale+1) compiles/run)
  * data pyramid resized on device once per scale; batches formed in-jit
  * noise-amp calibration syncs ONE scalar to host per scale
    (train_image.py:134-148)
  * per-scale fresh discriminator, warm-started from the previous GAN scale
    (train_image.py:29-39)
  * checkpoints: netG_<k>.ckpt / netD_<k>.ckpt + intermediate.json carrying
    {noise_amps, scale_idx} (train_image.py:206-210)
"""

from __future__ import annotations

import logging
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import models
from ..data.image import SingleImageDataset, make_image_batch_body
from ..data.video import SingleVideoDataset, make_video_batch_body
from ..optim import adam, clipped_adam
from ..utils import pyramid
from ..utils.progress import create_progressbar
from ..utils.saver import DataSaver
from .partition import lr_tree_for, make_lr_plan, split_params
from .state import ScaleTrainState
from .steps import (make_calibration, make_recon, make_sampler,
                    make_train_chunk)


def _amps_array(noise_amps: List[float], stop_scale: int) -> jnp.ndarray:
    arr = np.zeros((stop_scale + 2,), np.float32)
    arr[:len(noise_amps)] = np.asarray(noise_amps, np.float32)
    return jnp.asarray(arr)


def init_next_stage(cfg, g_params, g_state, key, ndim: int):
    if ndim == 2:
        return models.networks_2d.generator_init_next_stage(cfg, g_params,
                                                            g_state, key)
    return models.networks_3d.generator_init_next_stage(cfg, g_params,
                                                        g_state, key)


def _load_netD(saver: DataSaver, filename: str, path, ndim: int):
    """netD warm-start load with content dispatch: resuming a
    reference-trained experiment (--netG on its MindSpore netG) finds
    MindSpore netD_<k-1>.ckpt files in the same directory."""
    import os

    full = os.path.join(path or saver.experiment_dir, filename)
    from ..tools.ms_ckpt import is_ms_checkpoint, load_ms_checkpoint
    if os.path.isfile(full) and is_ms_checkpoint(full):
        from ..tools.convert import m2j_WDiscriminator
        p, s = m2j_WDiscriminator(load_ms_checkpoint(full), ndim=ndim)
        return {"params": p, "state": s}
    return saver.load_checkpoint(filename, path=path)


def train_scale(cfg, g_params, g_state, dataset, saver: DataSaver,
                noise_amps: List[float], key, ndim: int,
                resumed_idx: int = -1, resume_dir: str = "",
                step_callback=None, split_steps: bool = False,
                prebuilt=None, precompiler=None, inflight=None):
    """Train one pyramid scale. Returns (g_params, g_state, noise_amps, key).

    prebuilt: optional pipeline.ProgramBundle with this scale's programs
    already AOT-compiled (--compile-ahead); ignored under split_steps.
    precompiler: when set, the NEXT scale's background compile is kicked off
    right after THIS scale's first chunk finishes compiling — starting it
    earlier contends with this scale's own compile in the (serialized)
    remote-compile helper and stalls the scale.
    inflight: optional mid-scale resume payload {"state": ScaleTrainState,
    "key": outer PRNG key, "iter": chunk-boundary iteration} from an
    inflight_<k>.ckpt (--ckpt-interval). Skips D init, optimizer init, and
    amp calibration — the checkpoint carries all of it — and continues the
    scale bit-exactly from the saved iteration."""
    scale_idx = cfg.scale_idx
    if prebuilt is not None and (split_steps or prebuilt.scale_idx != scale_idx):
        prebuilt = None
    vae_phase = cfg.vae_levels >= scale_idx + 1
    g_apply = models.get_generator(cfg.generator, ndim)[1]
    d_init, d_apply = models.get_discriminator(cfg.discriminator, ndim)

    # --- fresh discriminator, warm-started at GAN scales (train_image.py:29-39)
    d_params = d_state = None
    if inflight is None:
        key, kd = jax.random.split(key)
        d_params, d_state = d_init(cfg, kd)
        if not vae_phase:
            try:
                if resumed_idx == scale_idx and resume_dir:
                    ckpt = _load_netD(saver, f"netD_{scale_idx - 1}.ckpt",
                                      resume_dir, ndim)
                    d_params, d_state = ckpt["params"], ckpt["state"]
                elif cfg.vae_levels < scale_idx:
                    ckpt = _load_netD(saver, f"netD_{scale_idx - 1}.ckpt",
                                      None, ndim)
                    d_params, d_state = ckpt["params"], ckpt["state"]
            except FileNotFoundError:
                logging.warning("no previous netD checkpoint to warm-start from")

    # --- optimizers (train_image.py:42-91); with a prebuilt bundle the
    # optimizer OBJECTS must be the ones the compiled chunk closed over
    if prebuilt is not None:
        plan, opt_g, opt_d = prebuilt.plan, prebuilt.opt_g, prebuilt.opt_d
    else:
        plan = make_lr_plan(cfg, scale_idx, len(g_params["body"]))
        opt_g = clipped_adam(lr_tree_for(
            split_params(g_params, plan)[0], plan), cfg.beta1,
            grad_clip=cfg.grad_clip, flat=cfg.flat_opt)
        opt_d = adam(cfg.lr_d, cfg.beta1, flat=cfg.flat_opt)
    opt_g_state = opt_d_state = None
    if inflight is None:
        trainable, _ = split_params(g_params, plan)
        opt_g_state = opt_g.init(trainable)
        opt_d_state = opt_d.init(d_params)

    # --- jitted programs for this scale
    calib = make_calibration(cfg, g_apply)
    if ndim == 2:
        data_scale = dataset.scale_image(scale_idx)
        data_zero = dataset.scale_image(0)
    else:
        data_scale = dataset.scale_frames(scale_idx)
        data_zero = dataset.scale_frames(0)
    if prebuilt is not None:
        batch_body = prebuilt.batch_body
    elif ndim == 2:
        batch_body = make_image_batch_body(cfg, scale_idx)
    else:
        batch_body = make_video_batch_body(cfg, scale_idx)
    batch_fn = jax.jit(batch_body)

    # Optional data-parallel mesh (batch sharded over 'data', params
    # replicated; a capability the reference lacks — SURVEY §2.3)
    mesh = None
    if cfg.mesh_data > 1 or cfg.mesh_sp > 1:
        from ..parallel.mesh import make_mesh, replicate_sharding
        assert cfg.batch_size % cfg.mesh_data == 0, \
            f"batch {cfg.batch_size} not divisible by mesh_data {cfg.mesh_data}"
        mesh = make_mesh(cfg.mesh_data * cfg.mesh_sp,
                         data_parallel=cfg.mesh_data)

    # Fused iteration chunks: `steps_per_call` iterations (batch + D + G)
    # per XLA dispatch. Host dispatch dominates small scales on TPU.
    # split_steps compiles D and G updates as SEPARATE programs instead —
    # slower dispatch, but the combined chunk at the largest 3D scales can
    # exceed what some TPU compilers handle (each half compiles fine).
    g_pair = models.get_generator_pair(cfg.generator, ndim) \
        if getattr(cfg, "paired_g", False) else None
    if split_steps:
        from .steps import make_d_step, make_g_step
        g_step = make_g_step(cfg, g_apply, d_apply, opt_g, plan, vae_phase,
                             g_pair=g_pair, mesh=mesh)
        d_step = make_d_step(cfg, g_apply, d_apply, opt_d, mesh=mesh)
        spc = 1
        chunk = chunk_rem = None
    elif prebuilt is not None:
        spc, chunk, chunk_rem = prebuilt.spc, prebuilt.chunk, prebuilt.chunk_rem
        mesh = prebuilt.mesh
    else:
        spc = max(1, min(cfg.steps_per_call, cfg.niter))
        chunk = make_train_chunk(cfg, g_apply, d_apply, opt_g, opt_d, plan,
                                 vae_phase, batch_body, spc, mesh=mesh,
                                 g_pair=g_pair)
        rem = cfg.niter % spc
        chunk_rem = None
        if rem:
            chunk_rem = make_train_chunk(cfg, g_apply, d_apply, opt_g, opt_d,
                                         plan, vae_phase, batch_body, rem,
                                         mesh=mesh, g_pair=g_pair)

    if inflight is None:
        key, ks = jax.random.split(key)
        state = ScaleTrainState(g_params, g_state, d_params, d_state,
                                opt_g_state, opt_d_state, ks)
    else:
        # mid-scale resume: the inflight checkpoint IS the full train state
        # at a chunk boundary; restoring it plus the outer key continues
        # the scale bit-exactly (tests/test_resume.py)
        state = jax.tree_util.tree_map(jnp.asarray, inflight["state"])
        key = jnp.asarray(inflight["key"])
    if mesh is not None:
        from ..parallel.mesh import replicate_sharding
        state = jax.device_put(state, replicate_sharding(mesh))

    # --- noise-amp calibration (train_image.py:134-148): one host sync/scale
    if inflight is not None:
        # the resumed scale's amp was calibrated before the inflight save
        # and travels in intermediate.json; recalibrating would re-draw
        assert len(noise_amps) == scale_idx + 1, (len(noise_amps), scale_idx)
    elif cfg.const_amp:
        noise_amps.append(1.0)
    elif scale_idx == 0:
        noise_amps.append(1.0)
    else:
        noise_amps.append(0.0)
        key, kb, kc = jax.random.split(key, 3)
        real, real_zero, _ = batch_fn(data_scale, data_zero, kb)
        rmse = calib(state.g_params, state.g_state, real, real_zero,
                     _amps_array(noise_amps, cfg.stop_scale), kc)
        # reference bug #3 (train_image.py:147): the batch-MEAN RMSE is
        # divided by batch_size again, shrinking the injected noise amp
        # batch-fold at batch>1 (latent in the reference — it only ever
        # trains batch 1, where /1 is identity). Fixed by default so the
        # amp is batch-invariant; --bug-compat restores the division.
        denom = cfg.batch_size if cfg.bug_compat else 1
        noise_amps[-1] = cfg.noise_amp_init * float(rmse) / denom
    amps = _amps_array(noise_amps, cfg.stop_scale)

    start_iter = int(inflight["iter"]) if inflight is not None else 0
    if start_iter % spc != 0:
        # inflight saves land on chunk boundaries of the ORIGINAL run; a
        # resume with a different --steps-per-call would silently train the
        # wrong number of iterations in the tail chunk
        raise ValueError(
            f"inflight iteration {start_iter} is not a multiple of "
            f"steps_per_call={spc}; resume with the original "
            f"--steps-per-call (or one that divides {start_iter})")
    from ..parallel import multihost
    bar = create_progressbar(
        total=cfg.niter, initial=start_iter,
        desc="Training scale [{}/{}]".format(scale_idx + 1, cfg.stop_scale + 1),
        # one bar per run: non-primary pod processes mirror the computation
        # but not the console/logbook throughput line
        disable=not multihost.is_primary())

    # visualization programs are built ONCE per scale (a fresh jit closure
    # per call would recompile the full generator at every image interval)
    viz = None
    if cfg.visualize and ndim == 2:
        viz = (make_recon(cfg, g_apply), make_sampler(cfg, g_apply, train=True))

    metrics = {}
    for iteration in range(start_iter, cfg.niter, spc):
        if split_steps:
            key, kb = jax.random.split(key)
            real, real_zero, noise_init = batch_fn(data_scale, data_zero, kb)
            if not vae_phase:
                state, d_metrics = d_step(state, real, noise_init, amps)
            state, metrics = g_step(state, real, real_zero, noise_init, amps)
            if not vae_phase:
                metrics.update(d_metrics)
        else:
            this_chunk = chunk if iteration + spc <= cfg.niter else chunk_rem
            state, metrics = this_chunk(state, data_scale, data_zero, amps)
        if iteration == start_iter and precompiler is not None:
            # this scale's programs are compiled now — overlap the rest of
            # its training with the next scale's compile
            precompiler.start(cfg, state.g_params, state.g_state, dataset,
                              scale_idx + 1)
        done = min(iteration + spc, cfg.niter)
        bar.update(done - iteration)

        if done % cfg.print_interval < spc:
            vals = {k: float(v) for k, v in metrics.items()}
            # failure detection: the reference trains blind (SURVEY §5 — no
            # guards at all); here divergence aborts with context instead of
            # silently wasting the remaining scales
            bad = [k for k, v in vals.items() if not np.isfinite(v)]
            if bad:
                raise RuntimeError(
                    f"non-finite training metrics {bad} at scale "
                    f"{scale_idx} iter {done} (amps={noise_amps})")
            logging.logbook("[Scale {}/Iter {}] Noise amp: {:.5f}, {}".format(
                scale_idx + 1, done, noise_amps[-1],
                ", ".join(f"{k}: {v:.5f}" for k, v in sorted(vals.items()))))

        if viz is not None and done % cfg.image_interval < spc:
            key, kb, kv = jax.random.split(key, 3)
            real, real_zero, noise_init = batch_fn(data_scale, data_zero, kb)
            _visualize(viz, saver, state, real, real_zero, noise_init,
                       amps, kv, done)

        # mid-scale checkpoint (--ckpt-interval): FULL train state at a
        # chunk boundary, so a supervisor restart continues bit-exactly
        # instead of losing the scale (crash ordering in saver.save_inflight).
        # AFTER the viz block: visualization advances the outer key, and a
        # pre-viz snapshot would resume with a key the uninterrupted run no
        # longer has (split-step mode feeds that key to every future batch)
        if (cfg.ckpt_interval and done < cfg.niter and done % spc == 0
                and done % cfg.ckpt_interval < spc):
            saver.save_inflight(scale_idx, state, key, done, noise_amps)

        if step_callback is not None:
            step_callback(done, state, metrics)

    bar.close()

    # --- save (train_image.py:206-210), crash-ordered in
    # DataSaver.finalize_scale: checkpoints, then marker, then inflight drop
    saver.finalize_scale(
        scale_idx, noise_amps,
        {"params": state.g_params, "state": state.g_state},
        None if vae_phase else {"params": state.d_params,
                                "state": state.d_state},
        key=key)
    return state.g_params, state.g_state, noise_amps, key


def _visualize(viz, saver, state, real, real_zero, noise_init, amps,
               key, iteration):
    """Periodic image dumps (train_image.py:179-200), denormalized properly."""
    recon, sample = viz

    def denorm(x):
        return np.clip((np.asarray(x) + 1) * 127.5, 0, 255)

    saver.save_image(denorm(real), f"real_{iteration + 1}.jpg")
    gen, gen_vae = recon(state.g_params, state.g_state, real_zero, amps, key)
    saver.save_image(denorm(gen), f"generated_{iteration + 1}.jpg")
    saver.save_image(denorm(gen_vae), f"generated_vae_{iteration + 1}.jpg")
    # ONE sampler dispatch: save_image writes sample [0] only, so the
    # reference's 3-draw grid loop (train_image.py:190-198, whose grid save
    # is itself broken) would be 3x dead device work + d2h on the
    # latency-charged remote transport
    key, kn, ks = jax.random.split(key, 3)
    noise = jax.random.normal(kn, noise_init.shape)
    fake, fake_vae = sample(state.g_params, state.g_state, noise, amps, ks)
    saver.save_image(denorm(np.asarray(fake)[0:1]), f"fake_var_{iteration}.jpg")
    saver.save_image(denorm(np.asarray(fake_vae)[0:1]),
                     f"fake_vae_var{iteration}.jpg")


def run_scale_with_retry(train_fn, cfg, g_params, g_state, key,
                         retries: int = 2):
    """Elastic recovery (the reference has none, SURVEY §5): transient
    runtime/transport failures (e.g. a remote-TPU compile stream dropping
    mid-scale) restart the CURRENT scale from an in-memory entry snapshot
    instead of killing a multi-hour run. Deliberate aborts (non-finite
    metrics, assertions, Ctrl-C) are not retried.

    train_fn(g_params, g_state, key, split_steps) runs one scale; retries
    pass split_steps=True (the combined D+G chunk may have exceeded the
    compiler — each half always compiles)."""
    import jax.errors

    from ..utils.saver import snapshot_tree

    scale_idx = cfg.scale_idx
    # host snapshot of the scale's ENTRY state: the failed attempt may have
    # consumed donated device buffers, and checkpoint files may live in a
    # different directory on resumed runs — the snapshot is directory-free.
    # Deadline-guarded: a dropped d2h on the remote-TPU tunnel can block
    # the readback forever; on timeout snapshot_tree retries via fresh
    # device copies (new RPCs), and if those hang too it KEEPS the
    # donation-safe device copies so the run proceeds (the wedge has been
    # observed to clear; scripts/train_watchdog.sh is the external net for
    # a truly dead channel).
    entry, snap_kind = snapshot_tree({"params": g_params, "state": g_state,
                                      "key": key})
    if snap_kind != "host":
        logging.warning("scale %d entry snapshot d2h hung once; recovered "
                        "via %s", scale_idx, snap_kind)
    for attempt in range(retries + 1):
        try:
            return train_fn(g_params, g_state, key, attempt > 0)
        except jax.errors.JaxRuntimeError as e:
            # only device/transport failures are retryable; every other
            # exception (bugs, deliberate aborts, KeyboardInterrupt) raises
            if attempt == retries:
                raise
            logging.warning("scale %d failed (%s: %s) — retry %d/%d from the "
                            "scale entry snapshot", scale_idx,
                            type(e).__name__, str(e)[:200], attempt + 1,
                            retries)
            # jnp.copy, NOT asarray: with a device-kind snapshot asarray is
            # a no-op and the retried chunk (donate_argnums) would consume
            # the snapshot buffers themselves — a second failure would then
            # find them deleted, killing the run this path exists to save
            g_params = jax.tree_util.tree_map(jnp.copy, entry["params"])
            g_state = jax.tree_util.tree_map(jnp.copy, entry["state"])
            # restore the scale-entry RNG key so a retried run stays
            # reproducible from its seed (the failed attempt's draws are
            # discarded along with its params)
            key = jnp.copy(entry["key"])


def _train_scale_with_retry(cfg, g_params, g_state, dataset, saver,
                            noise_amps, key, ndim, resumed_idx, resume_dir,
                            step_callback, retries: int = 2, prebuilt=None,
                            precompiler=None, inflight=None):
    amps_in = list(noise_amps)

    def train_fn(gp, gs, k, split_steps):
        split_steps = split_steps or getattr(cfg, "split_step", False)
        return train_scale(cfg, gp, gs, dataset, saver, list(amps_in), k,
                           ndim, resumed_idx, resume_dir, step_callback,
                           split_steps=split_steps,
                           prebuilt=None if split_steps else prebuilt,
                           precompiler=precompiler, inflight=inflight)

    return run_scale_with_retry(train_fn, cfg, g_params, g_state, key,
                                retries=retries)


def run_training(cfg, mode: str = "image", seed: Optional[int] = None,
                 step_callback=None):
    """Full multi-scale run (the reference __main__ scale loop,
    train_image.py:385-391). Returns (g_params, g_state, noise_amps, saver)."""
    ndim = 2 if mode == "image" else 3
    assert cfg.vae_levels > 0
    assert cfg.disc_loss_weight > 0

    from ..parallel.mesh import select_device
    select_device(cfg.device_id)

    # multi-process runs (TPU pods; parallel/multihost.py): exactly one
    # process owns file IO — the rest compute the identical replicated
    # program against a NullSaver (shared-FS writes would otherwise race)
    from ..parallel import multihost
    saver = multihost.select_saver(
        cfg, lambda: getattr(cfg, "saver", None) or DataSaver(cfg))
    cfg.saver = saver

    if mode == "image":
        dataset = SingleImageDataset(cfg)
    else:
        dataset = SingleVideoDataset(cfg)

    # re-persist args.txt now that the dataset computed derived config
    # (ar, org_fps, fps_lcm) — the reference writes args.txt after building
    # the dataset (train_image.py:323-339); eval/export re-hydrate from it,
    # so a pre-dataset snapshot would bake ar=1.0 into their geometry
    if multihost.is_primary():
        import os as _os
        cfg.write_args_txt(_os.path.join(saver.experiment_dir, "args.txt"))

    seed = seed if seed is not None else (cfg.manualSeed or 0)
    key = jax.random.PRNGKey(seed)
    key, kg = jax.random.split(key)
    g_init = models.get_generator(cfg.generator, ndim)[0]
    g_params, g_state = g_init(cfg, kg)

    noise_amps: List[float] = []
    cfg.scale_idx = 0
    resumed_idx, resume_dir = -1, ""
    inflight_payload = None

    # --- resume (train_image.py:361-379)
    if cfg.netG:
        import json
        import os
        inter_dir = os.path.dirname(cfg.intermediate)
        with open(os.path.join(inter_dir, "intermediate.json")) as f:
            inter = json.load(f)
        noise_amps = list(inter["noise_amps"])
        cfg.scale_idx = resumed_idx = int(inter["scale_idx"])
        resume_dir = os.path.dirname(cfg.netG)
        from ..utils.saver import load_pytree
        native_ckpt = False
        if cfg.netG.endswith(".pth"):
            # continue training a reference-trained torch experiment
            # (reference resumes only from its own .ckpt, train_image.py:374)
            from ..tools.convert import load_torch_checkpoint, p2j_HPVAEGAN
            params, st = p2j_HPVAEGAN(load_torch_checkpoint(cfg.netG),
                                      ndim=ndim)
            ckpt = {"params": params, "state": st}
        else:
            from ..tools.ms_ckpt import is_ms_checkpoint, load_ms_checkpoint
            if is_ms_checkpoint(cfg.netG):
                # MindSpore-saved generator (the reference's own resume
                # format, train_image.py:374-377); content-sniffed — our
                # pytree checkpoints share the .ckpt suffix
                from ..tools.convert import m2j_HPVAEGAN
                params, st = m2j_HPVAEGAN(load_ms_checkpoint(cfg.netG),
                                          ndim=ndim)
                ckpt = {"params": params, "state": st}
            else:
                ckpt = load_pytree(cfg.netG)
                native_ckpt = True
        if inter.get("inflight") \
                and os.path.basename(cfg.netG) == inter["inflight"]:
            # mid-scale resume (--ckpt-interval): the inflight ckpt carries
            # the FULL train state; the ckpt's own iter is authoritative (a
            # kill between the ckpt and intermediate writes leaves the
            # previous consistent marker pointing at the same file)
            inflight_payload = {"state": ckpt["state"], "key": ckpt["key"],
                                "iter": int(ckpt["iter"])}
            g_params = ckpt["state"].g_params
            g_state = ckpt["state"].g_state
            assert len(noise_amps) == cfg.scale_idx + 1, \
                (len(noise_amps), cfg.scale_idx)
        else:
            # the checkpointed pytree already carries the grown body (no
            # need to replay init_next_stage like the reference's flat-name
            # load, train_image.py:377-379)
            g_params, g_state = ckpt["params"], ckpt["state"]
            assert len(g_params["body"]) == cfg.scale_idx, \
                (len(g_params["body"]), cfg.scale_idx)
            if "key" in inter and native_ckpt:
                # our finalize markers carry the end-of-scale outer PRNG
                # key: scale_idx is a COMPLETED scale, so continue at the
                # NEXT one bit-exactly (same key, same amps, D warm-start
                # from the completed scale's netD — byte-identical to what
                # an uninterrupted run reads from its own dir). The
                # reference's keyless marker instead RETRAINS the finished
                # scale from its own trained params (train_image.py:361-379
                # — double-trains it and recalibrates its amp); that path
                # is kept below, and also applies when the generator is a
                # CONVERTED torch/MindSpore file: a foreign netG invalidates
                # the marker's key/amp pairing (the key continues a state
                # that checkpoint never trained), so retrain + recalibrate.
                assert len(noise_amps) == cfg.scale_idx + 1, \
                    (len(noise_amps), cfg.scale_idx)
                key = jnp.asarray(inter["key"], dtype=jnp.uint32)
                from ..parallel import multihost as _mh
                src = os.path.join(resume_dir,
                                   f"netD_{cfg.scale_idx}.ckpt")
                dst = os.path.join(saver.experiment_dir,
                                   f"netD_{cfg.scale_idx}.ckpt")
                if _mh.is_primary() and os.path.isfile(src) \
                        and not os.path.exists(dst):
                    import shutil
                    shutil.copy(src, dst)
                _mh.sync("resume_netd_copy")
                cfg.scale_idx += 1
                resumed_idx, resume_dir = -1, ""
                if cfg.scale_idx > cfg.stop_scale:
                    logging.info(
                        "resume: all %d scales already complete — nothing "
                        "to train", cfg.stop_scale + 1)
            else:
                # the saved amps list already includes the resumed scale;
                # retrain it (reference resume semantics)
                noise_amps = noise_amps[:cfg.scale_idx]

    pre = None
    if getattr(cfg, "compile_ahead", False) \
            and not getattr(cfg, "split_step", False):
        # (split mode discards combined-chunk bundles, so background
        # compiles of them would only clog the serialized compile channel)
        from .pipeline import ScalePrecompiler
        pre = ScalePrecompiler(ndim)

    while cfg.scale_idx < cfg.stop_scale + 1:
        if cfg.scale_idx > 0 and resumed_idx != cfg.scale_idx:
            key, kn = jax.random.split(key)
            g_params, g_state = init_next_stage(cfg, g_params, g_state, kn, ndim)
        if mode == "video":
            fps, td, fps_index = pyramid.get_fps_td_by_index(
                cfg.scale_idx, cfg.stop_scale_time, cfg.sampling_rates,
                cfg.org_fps, cfg.fps_lcm)
            cfg.fps, cfg.td, cfg.fps_index = fps, td, fps_index
            logging.info("scale %d: fps %.2f, time-depth %d, rate %d",
                         cfg.scale_idx, fps, td,
                         cfg.sampling_rates[fps_index])
        prebuilt = pre.take(cfg.scale_idx) if pre is not None else None
        t0 = time.time()
        # pre is handed down so the k+1 compile starts only after scale k's
        # own first chunk has compiled (remote-compile helper is serialized)
        g_params, g_state, noise_amps, key = _train_scale_with_retry(
            cfg, g_params, g_state, dataset, saver, noise_amps, key, ndim,
            resumed_idx, resume_dir, step_callback, prebuilt=prebuilt,
            precompiler=pre, inflight=inflight_payload)
        inflight_payload = None
        logging.info("scale %d done in %.1fs (%.2f it/s)", cfg.scale_idx,
                     time.time() - t0, cfg.niter / max(time.time() - t0, 1e-9))
        cfg.scale_idx += 1

    # pods: don't let a non-primary teardown race the primary's final
    # checkpoint write (launchers commonly kill stragglers on first exit)
    multihost.sync("run_training_end")
    return g_params, g_state, noise_amps, saver
