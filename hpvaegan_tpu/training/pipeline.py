"""Compile-ahead pipelining: overlap scale k's training with scale k+1's
XLA compile.

The per-scale fused train chunk takes minutes to compile through the
remote-TPU tunnel (docs/PERF.md: 3-6 min at the finest 2D scale, ~8 min for
the largest 3D chunk) while the training compute for typical iteration
counts is comparable — serial compile+train roughly doubles full-run wall
clock. The reference has nothing like this (every scale blocks on graph
construction, train_image.py:42-91).

Mechanism: while scale k trains, a daemon thread builds scale k+1's full
program bundle (grown generator shapes via jax.eval_shape — no real arrays),
then AOT-compiles the chunk with .lower(<ShapeDtypeStructs>).compile(). The
compiled executable lands in the jit cache of the SAME chunk callable that
train_scale will invoke, so the first real call is a cache hit. Any failure
in the thread falls back silently to the normal compile-at-first-call path.

Enabled with --compile-ahead (cfg.compile_ahead).
"""

from __future__ import annotations

import copy
import logging
import threading
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import models
from ..utils import pyramid
from .partition import lr_tree_for, make_lr_plan, split_params
from .state import ScaleTrainState
from .steps import make_train_chunk


class ProgramBundle:
    """Everything train_scale needs to run a scale with a pre-compiled chunk.

    The optimizer objects MUST be the ones the chunk closed over (optax
    transforms are compared by identity inside the traced closure), so the
    bundle carries them alongside the jitted callables."""

    def __init__(self, scale_idx: int, cfg, plan, opt_g, opt_d, batch_body,
                 chunk, chunk_rem, spc: int, mesh):
        self.scale_idx = scale_idx
        self.cfg = cfg
        self.plan = plan
        self.opt_g = opt_g
        self.opt_d = opt_d
        self.batch_body = batch_body
        self.chunk = chunk
        self.chunk_rem = chunk_rem
        self.spc = spc
        self.mesh = mesh


def _snapshot_cfg(cfg, scale_idx: int, ndim: int):
    """Static copy of cfg advanced to `scale_idx` (the live cfg keeps being
    mutated by the main thread)."""
    cfg2 = copy.copy(cfg)
    if hasattr(cfg2, "saver"):
        cfg2.saver = None
    cfg2.scale_idx = scale_idx
    if ndim == 3:
        fps, td, fi = pyramid.get_fps_td_by_index(
            scale_idx, cfg.stop_scale_time, cfg.sampling_rates, cfg.org_fps,
            cfg.fps_lcm)
        cfg2.fps, cfg2.td, cfg2.fps_index = fps, td, fi
    return cfg2


def build_scale_bundle(cfg, g_params_abs, g_state_abs, dataset, ndim: int,
                       mesh=None) -> ProgramBundle:
    """Construct scale cfg.scale_idx's programs from ABSTRACT generator
    shapes (works identically with real arrays). Mirrors
    trainer.train_scale's program construction exactly."""
    from ..data.image import make_image_batch_body
    from ..data.video import make_video_batch_body
    from ..optim import adam, clipped_adam

    scale_idx = cfg.scale_idx
    vae_phase = cfg.vae_levels >= scale_idx + 1
    g_apply = models.get_generator(cfg.generator, ndim)[1]
    d_apply = models.get_discriminator(cfg.discriminator, ndim)[1]

    plan = make_lr_plan(cfg, scale_idx, len(g_params_abs["body"]))
    trainable_abs, _ = split_params(g_params_abs, plan)
    opt_g = clipped_adam(lr_tree_for(trainable_abs, plan), cfg.beta1,
                         grad_clip=cfg.grad_clip, flat=cfg.flat_opt)
    opt_d = adam(cfg.lr_d, cfg.beta1, flat=cfg.flat_opt)

    if ndim == 2:
        batch_body = make_image_batch_body(cfg, scale_idx)
    else:
        batch_body = make_video_batch_body(cfg, scale_idx)

    g_pair = models.get_generator_pair(cfg.generator, ndim) \
        if getattr(cfg, "paired_g", False) else None
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
    return ProgramBundle(scale_idx, cfg, plan, opt_g, opt_d, batch_body,
                         chunk, chunk_rem, spc, mesh)


def _sds(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)


def _precompile(bundle: ProgramBundle, g_params_abs, g_state_abs, dataset,
                ndim: int) -> None:
    """AOT-compile the bundle's chunk against the scale's exact shapes."""
    cfg = bundle.cfg
    scale_idx = bundle.scale_idx
    d_init = models.get_discriminator(cfg.discriminator, ndim)[0]
    d_abs = jax.eval_shape(lambda k: d_init(cfg, k),
                           jax.ShapeDtypeStruct((2,), jnp.uint32))
    d_params_abs, d_state_abs = d_abs
    trainable_abs, _ = split_params(g_params_abs, bundle.plan)
    opt_g_abs = jax.eval_shape(bundle.opt_g.init, trainable_abs)
    opt_d_abs = jax.eval_shape(bundle.opt_d.init, d_params_abs)
    key_abs = jax.ShapeDtypeStruct((2,), jnp.uint32)
    state_abs = ScaleTrainState(g_params_abs, g_state_abs, d_params_abs,
                                d_state_abs, opt_g_abs, opt_d_abs, key_abs)
    if bundle.mesh is not None:
        # mesh runs call the chunk with the state device_put to the
        # replicated NamedSharding (trainer.py:159-161); the jit cache key
        # includes resolved input shardings, so the AOT lowering must carry
        # the same sharding or the first real call re-compiles (measured:
        # plain ShapeDtypeStructs lower as GSPMD-replicated, which does NOT
        # match). Data args stay unannotated — they arrive as uncommitted
        # jit outputs (UnspecifiedValue either way).
        from ..parallel.mesh import replicate_sharding
        repl = replicate_sharding(bundle.mesh)
        state_abs = jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=repl),
            state_abs)

    if ndim == 2:
        data_scale = _sds(dataset.scale_image(scale_idx))
        data_zero = _sds(dataset.scale_image(0))
    else:
        data_scale = _sds(dataset.scale_frames(scale_idx))
        data_zero = _sds(dataset.scale_frames(0))
    amps_abs = jax.ShapeDtypeStruct((cfg.stop_scale + 2,), jnp.float32)

    bundle.chunk.lower(state_abs, data_scale, data_zero, amps_abs).compile()
    if bundle.chunk_rem is not None:
        bundle.chunk_rem.lower(state_abs, data_scale, data_zero,
                               amps_abs).compile()


class ScalePrecompiler:
    """Owns the background compile of the NEXT scale's programs."""

    def __init__(self, ndim: int):
        self.ndim = ndim
        self._thread: Optional[threading.Thread] = None
        self._bundle: Optional[ProgramBundle] = None
        self._ok = False
        # generation token: an ABANDONED worker (join timeout) may finish
        # later and must not clobber a newer generation's published bundle
        self._gen = 0
        self._lock = threading.Lock()

    def start(self, cfg, g_params, g_state, dataset, next_scale_idx: int,
              mesh=None) -> None:
        """Kick off compile of scale `next_scale_idx` while the caller trains
        the current scale. g_params/g_state: CURRENT scale's params (the
        next scale's shapes come from eval_shape of init_next_stage)."""
        from .trainer import init_next_stage

        if next_scale_idx > cfg.stop_scale:
            return
        cfg2 = _snapshot_cfg(cfg, next_scale_idx, self.ndim)
        if mesh is None and (cfg2.mesh_data > 1 or cfg2.mesh_sp > 1):
            from ..parallel.mesh import make_mesh
            mesh = make_mesh(cfg2.mesh_data * cfg2.mesh_sp,
                             data_parallel=cfg2.mesh_data)
        g_abs = _sds((g_params, g_state))
        with self._lock:
            self._gen += 1
            gen = self._gen
            self._ok = False
            self._bundle = None

        def work():
            try:
                grown_abs = jax.eval_shape(
                    lambda p, s, k: init_next_stage(cfg2, p, s, k, self.ndim),
                    g_abs[0], g_abs[1], jax.ShapeDtypeStruct((2,), jnp.uint32))
                bundle = build_scale_bundle(cfg2, grown_abs[0], grown_abs[1],
                                            dataset, self.ndim, mesh=mesh)
                _precompile(bundle, grown_abs[0], grown_abs[1], dataset,
                            self.ndim)
                with self._lock:
                    if self._gen != gen:
                        logging.info("compile-ahead: scale %d finished after "
                                     "being abandoned — result discarded",
                                     next_scale_idx)
                        return
                    self._bundle = bundle
                    self._ok = True
                logging.info("compile-ahead: scale %d programs ready",
                             next_scale_idx)
            except Exception as e:  # fall back to compile-at-first-call
                logging.warning("compile-ahead for scale %d failed (%s: %s) "
                                "— falling back to on-demand compile",
                                next_scale_idx, type(e).__name__,
                                str(e)[:200])

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    # Largest observed remote compile is ~9 min (docs/PERF.md); a hung
    # compile RPC past this bound must not deadlock the training run — the
    # retry machinery in run_scale_with_retry can only fire if take()
    # returns (the daemon thread is abandoned; its eventual result is
    # discarded and the scale compiles on demand).
    JOIN_TIMEOUT_S = 1800.0

    def take(self, scale_idx: int) -> Optional[ProgramBundle]:
        """Blocking (bounded): returns the prebuilt bundle for `scale_idx`
        or None (compile failed, mismatched, or timed out)."""
        if self._thread is None:
            return None
        self._thread.join(self.JOIN_TIMEOUT_S)
        if self._thread.is_alive():
            logging.warning(
                "compile-ahead: scale %d background compile still running "
                "after %.0fs — abandoning it, compiling on demand",
                scale_idx, self.JOIN_TIMEOUT_S)
            with self._lock:
                # invalidate the zombie's generation so a late finish
                # cannot publish over a newer start()
                self._gen += 1
                self._bundle = None
                self._ok = False
            self._thread = None
            return None
        self._thread = None
        with self._lock:
            if self._ok and self._bundle is not None \
                    and self._bundle.scale_idx == scale_idx:
                return self._bundle
        return None
