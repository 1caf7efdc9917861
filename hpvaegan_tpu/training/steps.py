"""Per-scale jitted training steps.

Each of make_d_step / make_g_step builds ONE fused XLA program per
(scale, phase): generator forward over all grown stages, loss, grads,
per-tensor clipping, Adam update — the reference's TrainOneStepCell pair
(train_image.py:42-91) re-expressed as pure jitted functions over a
ScaleTrainState. Data, noise and RNG all live on device; the host only
dispatches.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import optax

from ..losses import d_loss_fn, g_gan_loss_fn, g_vae_loss_fn
from .partition import merge_params, split_params
from .state import ScaleTrainState


def _cdtype(cfg):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None


def _mesh_shard_fn(mesh):
    """Batch-input sharding constraint for a ('data','sp') mesh (identity
    when mesh is None). Shared by the fused chunk and the split-step
    builders so the compile-fallback path keeps the SAME parallelism."""
    if mesh is None:
        return lambda x: x
    from jax.sharding import NamedSharding, PartitionSpec as P
    sp = mesh.shape.get("sp", 1)

    def _shard(x):
        spec = ["data"] + [None] * (x.ndim - 1)
        if sp > 1 and x.ndim >= 4:
            # H axis: 1 for (B,H,W,C) images, 2 for (B,T,H,W,C) video.
            # XLA SPMD inserts the conv halo exchanges; only shard when
            # divisible so the ceil-ladder's odd sizes fall back cleanly.
            # DECISION (SURVEY §2.3 CP row): for video the 'sp' axis
            # shards H, NOT T — the reference ladder's time depth is
            # 4..13 frames (rarely divisible by a mesh axis, and a
            # ker//2-frame halo is a large fraction of a <=4-frame
            # shard), while H reaches 256+ with a 1-row halo per
            # neighbor. T-axis CP stays available as a capability
            # (tests/test_parallel.py::
            # test_context_parallel_conv3d_over_time).
            h_axis = 1 if x.ndim == 4 else 2
            if x.shape[h_axis] % sp == 0:
                spec[h_axis] = "sp"
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(*spec)))

    return _shard


def _compiler_options(cfg):
    """cfg.xla_options forwarded through PJRT CompileOptions — reaches the
    remote compile service where the XLA_FLAGS env cannot."""
    return getattr(cfg, "xla_options", None) or None


def make_g_step(cfg, g_apply: Callable, d_apply: Callable, opt_g, plan,
                vae_phase: bool, g_pair: Callable = None, mesh=None):
    """Jitted single G update (the split-steps path: the compile fallback
    for chunks that exceed the compiler, and the dryrun hooks). Keeps the
    fused chunk's mesh sharding and compiler options."""
    core = _g_step_core(cfg, g_apply, d_apply, opt_g, plan, vae_phase,
                        _cdtype(cfg), g_pair=g_pair)
    shard = _mesh_shard_fn(mesh)

    def step(state, real, real_zero, noise_init, amps):
        return core(state, shard(real), shard(real_zero), shard(noise_init),
                    amps)

    return jax.jit(step, donate_argnums=(0,),
                   compiler_options=_compiler_options(cfg))


def _g_step_core(cfg, g_apply: Callable, d_apply: Callable, opt_g, plan,
                 vae_phase: bool, cd, g_pair: Callable = None):
    """VAE-phase or GAN-phase generator update (reference: losses.py:59-107 +
    train_image.py:152-159). Unjitted core, composable into scan chunks.

    g_pair (GAN phase): width-2B recon+fake forward with per-half BN stats —
    exact vs the two separate forwards (models.get_generator_pair)."""
    use_pair = g_pair is not None and not vae_phase

    def g_step(state: ScaleTrainState, real, real_zero, noise_init, amps):
        key, k_rec, k_fake = jax.random.split(state.key, 3)
        trainable, frozen = split_params(state.g_params, plan)

        def loss_fn(tr):
            params = merge_params(tr, frozen)
            if use_pair:
                (gen, fake, gen_vae, mu, logvar), gs2 = g_pair(
                    cfg, params, state.g_state, video=real_zero, amps=amps,
                    noise_init=noise_init, key=k_rec, train=True,
                    compute_dtype=cd)

                def d_fn(x):
                    return d_apply(cfg, state.d_params, state.d_state, x, cd)[0]

                total, aux = g_gan_loss_fn(cfg, d_fn, gen, real, fake)
                return total, (gs2, aux)
            out, gs1 = g_apply(cfg, params, state.g_state, video=real_zero,
                               amps=amps, noise_init=None, key=k_rec,
                               is_random=False, train=True, compute_dtype=cd)
            gen, gen_vae, mu, logvar = out[:4]
            if vae_phase:
                total, aux = g_vae_loss_fn(cfg, gen, gen_vae, real, real_zero,
                                           mu, logvar)
                new_gstate = gs1
            else:
                out2, gs2 = g_apply(cfg, params, gs1, video=None, amps=amps,
                                    noise_init=noise_init, key=k_fake,
                                    is_random=True, train=True, compute_dtype=cd)
                fake = out2[0]

                def d_fn(x):
                    return d_apply(cfg, state.d_params, state.d_state, x, cd)[0]

                total, aux = g_gan_loss_fn(cfg, d_fn, gen, real, fake)
                new_gstate = gs2
            return total, (new_gstate, aux)

        (loss, (new_gstate, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)
        updates, new_opt_g = opt_g.update(grads, state.opt_g, trainable)
        trainable_new = optax.apply_updates(trainable, updates)
        g_params = merge_params(trainable_new, frozen)
        metrics = {"g_loss": loss, **aux}
        return ScaleTrainState(g_params, new_gstate, state.d_params,
                               state.d_state, new_opt_g, state.opt_d, key), metrics

    return g_step


def make_d_step(cfg, g_apply: Callable, d_apply: Callable, opt_d, mesh=None):
    """Jitted single D update (split-steps path; see make_g_step)."""
    core = _d_step_core(cfg, g_apply, d_apply, opt_d, _cdtype(cfg))
    shard = _mesh_shard_fn(mesh)

    def step(state, real, noise_init, amps):
        return core(state, shard(real), shard(noise_init), amps)

    return jax.jit(step, donate_argnums=(0,),
                   compiler_options=_compiler_options(cfg))


def _d_step_core(cfg, g_apply: Callable, d_apply: Callable, opt_d, cd):
    """WGAN-GP discriminator update (reference: losses.py:17-52 +
    train_image.py:157). Unjitted core, composable into scan chunks."""

    def d_step(state: ScaleTrainState, real, noise_init, amps):
        key, k_fake, k_alpha = jax.random.split(state.key, 3)
        out, _ = g_apply(cfg, state.g_params, state.g_state, video=None,
                         amps=amps, noise_init=noise_init, key=k_fake,
                         is_random=True, train=True, compute_dtype=cd)
        fake = jax.lax.stop_gradient(out[0])
        # per-step GP alpha; bug_compat freezes it (reference losses.py:26
        # draws it once at cell init)
        alpha = jnp.float32(0.5) if cfg.bug_compat \
            else jax.random.uniform(k_alpha, ())

        def loss_fn(dp):
            # capture the new SN (u,v) state from d_loss_fn's FIRST D
            # application (the real pass — losses.py applies real first)
            state_box = []

            def d_fn(x):
                y, ns = d_apply(cfg, dp, state.d_state, x, cd)
                if not state_box:
                    state_box.append(ns)
                return y

            total, aux = d_loss_fn(cfg, d_fn, real, fake, alpha)
            return total, (state_box[0], aux)

        (loss, (new_dstate, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.d_params)
        updates, new_opt_d = opt_d.update(grads, state.opt_d)
        d_params = optax.apply_updates(state.d_params, updates)
        metrics = {"d_loss": loss, **aux}
        return ScaleTrainState(state.g_params, state.g_state, d_params,
                               new_dstate, state.opt_g, new_opt_d, key), metrics

    return d_step


def make_train_chunk(cfg, g_apply: Callable, d_apply: Callable, opt_g, opt_d,
                     plan, vae_phase: bool, batch_body: Callable,
                     steps_per_call: int, mesh=None, jit: bool = True,
                     g_pair: Callable = None):
    """Fuse `steps_per_call` full training iterations (batch forming + D step
    + G step) into ONE jitted lax.scan program.

    Host dispatch is the bottleneck for small scales on TPU (and doubly so
    through a remote-device tunnel): the reference pays 2 graph launches +
    host data feeding per iteration; this pays 1/steps_per_call launches per
    iteration with zero host->device traffic.

    batch_body(data_scale, data_zero, key) -> (real, real_zero, noise_init)
    must be jit-traceable (the make_*_batch_fn inner functions are).

    mesh: optional jax.sharding.Mesh for data-parallel training — the formed
    batch is sharding-constrained over the 'data' axis (params replicated;
    XLA inserts the gradient all-reduces). The reference has no DP at all
    (SURVEY §2.3).
    """
    cd = _cdtype(cfg)
    fused_dg = bool(getattr(cfg, "fused_dg", False)) and not vae_phase
    if fused_dg:
        dg_step = _fused_dg_step_core(cfg, g_apply, d_apply, opt_g, opt_d,
                                      plan, cd)
    else:
        g_step = _g_step_core(cfg, g_apply, d_apply, opt_g, plan, vae_phase,
                              cd, g_pair=g_pair)
        d_step = _d_step_core(cfg, g_apply, d_apply, opt_d, cd)
    _shard = _mesh_shard_fn(mesh)

    unroll = max(1, min(int(getattr(cfg, "scan_unroll", 1)), steps_per_call))

    def chunk(state: ScaleTrainState, data_scale, data_zero, amps):
        def body(carry, _):
            st = carry
            key, kb = jax.random.split(st.key)
            st = ScaleTrainState(st.g_params, st.g_state, st.d_params,
                                 st.d_state, st.opt_g, st.opt_d, key)
            real, real_zero, noise_init = batch_body(data_scale, data_zero, kb)
            real, real_zero, noise_init = (_shard(real), _shard(real_zero),
                                           _shard(noise_init))
            if fused_dg:
                st, metrics = dg_step(st, real, real_zero, noise_init, amps)
            else:
                if not vae_phase:
                    st, d_metrics = d_step(st, real, noise_init, amps)
                else:
                    d_metrics = {}
                st, metrics = g_step(st, real, real_zero, noise_init, amps)
                metrics.update(d_metrics)
            return st, metrics

        # unroll > 1 turns carry iterations into straight-line code, freeing
        # XLA from the loop's carry-layout contract (see docs/PERF.md)
        state, metrics = jax.lax.scan(body, state, None, length=steps_per_call,
                                      unroll=unroll)
        # last-iteration metrics
        return state, {k: v[-1] for k, v in metrics.items()}

    if not jit:
        return chunk
    return jax.jit(chunk, donate_argnums=(0,),
                   compiler_options=_compiler_options(cfg))


def _fused_dg_step_core(cfg, g_apply: Callable, d_apply: Callable, opt_g,
                        opt_d, plan, cd):
    """GAN-phase iteration where the D loss and the G adversarial loss share
    ONE fake forward (identical refinement noise) — XLA CSEs the generator
    forward between the two grad computations, ~10% end-to-end on v5e.
    Deviation from the reference (fresh noise per step's fake); the G step
    still sees the UPDATED discriminator, matching the reference order
    (train_image.py:157-159)."""

    def step(state: ScaleTrainState, real, real_zero, noise_init, amps):
        key, k_fake, k_alpha, k_rec = jax.random.split(state.key, 4)

        def make_fake(gp, g_state_in):
            out, gs = g_apply(cfg, gp, g_state_in, video=None, amps=amps,
                              noise_init=noise_init, key=k_fake,
                              is_random=True, train=True, compute_dtype=cd)
            return out[0], gs

        alpha = jnp.float32(0.5) if cfg.bug_compat \
            else jax.random.uniform(k_alpha, ())

        def d_loss(dp):
            fake = jax.lax.stop_gradient(make_fake(state.g_params,
                                                   state.g_state)[0])
            state_box = []

            def dfn(x):
                y, ns = d_apply(cfg, dp, state.d_state, x, cd)
                if not state_box:
                    state_box.append(ns)
                return y

            total, aux = d_loss_fn(cfg, dfn, real, fake, alpha)
            return total, (state_box[0], aux)

        (d_total, (new_dstate, d_aux)), d_grads = jax.value_and_grad(
            d_loss, has_aux=True)(state.d_params)
        du, new_opt_d = opt_d.update(d_grads, state.opt_d)
        d_params = optax.apply_updates(state.d_params, du)

        trainable, frozen = split_params(state.g_params, plan)

        def g_loss(tr):
            gp = merge_params(tr, frozen)
            out, gs1 = g_apply(cfg, gp, state.g_state, video=real_zero,
                               amps=amps, noise_init=None, key=k_rec,
                               is_random=False, train=True, compute_dtype=cd)
            # same noise as D's fake -> the primal forward CSEs (train-mode
            # BN outputs don't depend on the incoming state, only the new
            # state does — threading gs1 keeps the unfused steps' BN
            # moving-stat bookkeeping: recon pass then fake pass)
            fake, gs2 = make_fake(gp, gs1)

            def dfn(x):
                return d_apply(cfg, d_params, new_dstate, x, cd)[0]

            total, aux = g_gan_loss_fn(cfg, dfn, out[0], real, fake)
            return total, (gs2, aux)

        (g_total, (new_gstate, g_aux)), g_grads = jax.value_and_grad(
            g_loss, has_aux=True)(trainable)
        gu, new_opt_g = opt_g.update(g_grads, state.opt_g, trainable)
        trainable = optax.apply_updates(trainable, gu)
        g_params = merge_params(trainable, frozen)
        metrics = {"g_loss": g_total, "d_loss": d_total, **d_aux, **g_aux}
        return ScaleTrainState(g_params, new_gstate, d_params, new_dstate,
                               new_opt_g, new_opt_d, key), metrics

    return step


def make_calibration(cfg, g_apply: Callable):
    """Noise-amp calibration forward: RMSE(real, reconstruction)
    (reference: train_image.py:134-148). Host reads the scalar once per scale."""
    cd = _cdtype(cfg)

    @jax.jit
    def calib(g_params, g_state, real, real_zero, amps, key):
        out, _ = g_apply(cfg, g_params, g_state, video=real_zero, amps=amps,
                         noise_init=None, key=key, is_random=False, train=True,
                         compute_dtype=cd)
        return jnp.sqrt(jnp.mean((real - out[0]) ** 2))

    return calib


def make_sampler(cfg, g_apply: Callable, train: bool = True):
    """Batched random-mode forward for visualization/eval (replaces the
    reference's Python loop over samples, eval_image.py:54-61).

    train=True default is LOAD-BEARING: SinGAN-family sampling must run
    BatchNorm on batch statistics (the reference never calls
    set_train(False)); eval-mode moving stats wash out sample content
    (see parallel/sampling.sharded_sampler)."""
    cd = _cdtype(cfg)

    @jax.jit
    def sample(g_params, g_state, noise_init, amps, key):
        out, _ = g_apply(cfg, g_params, g_state, video=None, amps=amps,
                         noise_init=noise_init, key=key, is_random=True,
                         train=train, compute_dtype=cd)
        # SinGAN baselines return (x,) only (no separate vae_out)
        return out[0], (out[1] if len(out) > 1 else out[0])

    return sample


def make_recon(cfg, g_apply: Callable, train: bool = True):
    """Reconstruction-mode forward for visualization (train_image.py:183-187)."""
    cd = _cdtype(cfg)

    @jax.jit
    def recon(g_params, g_state, real_zero, amps, key):
        out, _ = g_apply(cfg, g_params, g_state, video=real_zero, amps=amps,
                         noise_init=None, key=key, is_random=False, train=train,
                         compute_dtype=cd)
        return out[0], out[1]

    return recon
