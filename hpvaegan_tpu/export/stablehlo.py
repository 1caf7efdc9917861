"""StableHLO export for native TPU serving.

Replaces the reference's MindIR export (export.py:79-81:
`mindspore.export(netG, noise_init, noise_amps, noise_init, MINDIR)`).
The exported program is the random-mode generator forward with weights baked
in as constants, taking:
    noise_init : f32 (1, latent_dim, H0, W0)   -- NCHW, byte-compatible with
                                                  the reference .bin contract
    noise_amps : f32 (stop_scale+2,)
    seed       : i32 ()                        -- per-stage refinement noise
                                                  (the reference bakes its
                                                  constexpr RNG as constants;
                                                  a seed input is strictly
                                                  more useful for serving)
and returning f32 (1, nc_im, H, W) NCHW samples.

Artifacts: <prefix>.stablehlo (jax.export serialized bytes, loadable with
jax.export.deserialize, versioned + portable) and <prefix>.mlir (StableHLO
text consumed by the native PJRT runner, native/pjrt_runner/).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from .. import models
from ..utils import pyramid


def make_serving_fn(cfg, g_params, g_state, ndim: int = 2):
    """Pure serving fn over (noise_init_nchw, noise_amps, seed)."""
    g_apply = models.get_generator(cfg.generator, ndim)[1]

    def fn(noise_init, noise_amps, seed):
        key = jax.random.PRNGKey(seed)
        if ndim == 2:
            z = jnp.transpose(noise_init, (0, 2, 3, 1))  # NCHW -> NHWC
        else:
            z = jnp.transpose(noise_init, (0, 2, 3, 4, 1))  # NCTHW -> NTHWC
        # train=True: batch-statistics BN — parity with the reference's
        # export, whose cells are serialized in the training phase
        # (export.py:80 never calls set_train(False)); moving-stat eval mode
        # visibly washes out sample content (see
        # parallel/sampling.sharded_sampler docstring). At batch 1 the batch
        # statistics ARE per-sample; at batch > 1 a plain batched forward
        # would pool BN stats ACROSS the exported batch, coupling samples —
        # so vmap batch-1 forwards with per-sample keys, exactly like
        # sharded_sampler. (batch == 1 keeps the unvmapped forward so
        # previously exported artifacts stay byte-identical for a seed.)
        b = z.shape[0]
        if b == 1:
            out, _ = g_apply(cfg, g_params, g_state, video=None,
                             amps=noise_amps, noise_init=z, key=key,
                             is_random=True, train=True)
            x = out[0]
        else:
            def one(z1, k):
                out, _ = g_apply(cfg, g_params, g_state, video=None,
                                 amps=noise_amps, noise_init=z1[None], key=k,
                                 is_random=True, train=True)
                return out[0][0]

            x = jax.vmap(one)(z, jax.random.split(key, b))
        if ndim == 2:
            return jnp.transpose(x, (0, 3, 1, 2))
        return jnp.transpose(x, (0, 4, 1, 2, 3))

    return fn


def serving_input_specs(cfg, ndim: int = 2,
                        batch: int = 1) -> Tuple[jax.ShapeDtypeStruct, ...]:
    h0, w0 = pyramid.scale_size_2d(0, cfg.scale_factor, cfg.stop_scale,
                                   cfg.img_size, cfg.ar)
    if ndim == 2:
        z_shape = (batch, cfg.latent_dim, h0, w0)
    else:
        _, td0, _ = pyramid.get_fps_td_by_index(0, cfg.stop_scale_time,
                                                cfg.sampling_rates, cfg.org_fps,
                                                cfg.fps_lcm)
        z_shape = (batch, cfg.latent_dim, td0, h0, w0)
    return (jax.ShapeDtypeStruct(z_shape, jnp.float32),
            jax.ShapeDtypeStruct((cfg.stop_scale + 2,), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.int32))


def export_sampler(cfg, g_params, g_state, ndim: int = 2, batch: int = 1,
                   platforms=("tpu", "cpu")):
    """Multi-platform export: servable on TPU, verifiable on CPU hosts."""
    fn = make_serving_fn(cfg, g_params, g_state, ndim)
    specs = serving_input_specs(cfg, ndim, batch)
    return jax_export.export(jax.jit(fn), platforms=platforms)(*specs)


def save_exported(exported, prefix: str, write_mlir: bool = True) -> None:
    with open(prefix + ".stablehlo", "wb") as f:
        f.write(exported.serialize())
    if write_mlir:
        if len(getattr(exported, "platforms", ()) or ()) > 1:
            # a multi-platform export's main() takes a hidden leading
            # _platform_index argument — the native runner feeds exactly
            # the declared 3 inputs and would fail at SERVE time, far from
            # this call. export.py does a second single-platform export
            # for the .mlir; refuse to write a broken one here.
            raise ValueError(
                "refusing to write a multi-platform .mlir (platforms="
                f"{exported.platforms}): its main() takes a hidden "
                "_platform_index arg the native runner cannot feed. "
                "Re-export with platforms=('tpu',) for the .mlir "
                "(see export.py) or pass write_mlir=False.")
        with open(prefix + ".mlir", "w") as f:
            f.write(exported.mlir_module())


def load_serialized(path: str):
    """Deserialize a portable export once; reuse across run_serialized calls
    (each deserialize+compile is minutes on a remote transport)."""
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())


def run_serialized(exported, *args):
    return exported.call(*[jnp.asarray(a) for a in args])


def load_and_run_serialized(path: str, *args):
    """Python-side runner for a serialized export (sanity/parity checks for
    the native runner)."""
    return run_serialized(load_serialized(path), *args)
