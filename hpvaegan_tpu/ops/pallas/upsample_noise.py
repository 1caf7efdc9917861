"""Pallas TPU kernel: fused align-corners bilinear upscale + noise injection.

The refinement hot path in random mode is
    x_in = upscale(x) + noise * amp            (networks_2d.py:272-277)
which XLA executes as: H-gather pass, W-gather pass, a threefry noise kernel,
and an FMA pass — ~4 HBM round-trips over the upscaled tensor. For batched
diverse-sample generation (BASELINE config 5: 64 samples/batch) those tensors
are tens of MB, so traffic dominates. This kernel does it in ONE pass per
batch element: input block -> VMEM, two small MXU matmuls for the separable
interpolation, hardware-PRNG normal noise (Box-Muller) generated in-register,
one write of the result.

Interpolation-as-matmul inside the kernel is exact here because the operands
are f32 and tiny (Mosaic uses f32 accumulation via preferred_element_type);
the 2-sparse structure wastes MXU FLOPs, but at C=3 refinement channels the
matmuls are ~100 MFLOP — noise vs the saved HBM passes.

Integration: `fused_upscale_noise_2d` returns the PAIR
`(upscale_2d(x), upscale_2d(x) + normal_noise * amp)` — numerically
equivalent to the unfused chain with a different (hardware) RNG stream;
the refinement residual consumes both (networks_2d.py). Enabled via
cfg.pallas_fused_sampling for the batched no-grad sampler.

Measured on v5e (B=64, 204->257, C=3): the single-output (noised-only)
kernel is 1.76x the XLA gather+threefry+FMA chain (52ms vs 92ms per call).
The refinement residual however needs the CLEAN upscale too
(networks_2d.py:281); with dual outputs the kernel measures neutral
(103ms vs 102ms) and the end-to-end sampler slightly slower, because XLA
fuses the clean path into downstream consumers. Hence
cfg.pallas_fused_sampling defaults to False; the kernel stands as the fused
fast path for single-output uses and as the base for a future
conv-of-upsampled-input fusion that would skip materializing x_up entirely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..resize import _interp_matrix


@functools.lru_cache(maxsize=None)
def _w_kron(n_in: int, n_out: int, c: int, align_corners: bool) -> np.ndarray:
    """(W_in*C, W_out*C) right-multiplication matrix: kron(A_w, I_C)^T."""
    a = _interp_matrix(n_in, n_out, align_corners)  # (n_out, n_in)
    return np.kron(a, np.eye(c, dtype=np.float32)).T.copy()


def fused_upscale_noise_2d(x: jnp.ndarray, out_hw, amp, seed,
                           align_corners: bool = True
                           ) -> "tuple[jnp.ndarray, jnp.ndarray]":
    """x: (B, H_in, W_in, C) f32 -> (clean, noised), each (B, H_out, W_out, C).

    One fused kernel per batch element: clean = bilinear upscale of x,
    noised = clean + N(0,1)*amp (the refinement residual needs BOTH,
    networks_2d.py:277-281, so the kernel emits both from one input pass).
    amp: scalar noise amplitude; seed: int32 scalar (per-call RNG seed).
    """
    b, h_in, w_in, c = x.shape
    h_out, w_out = int(out_hw[0]), int(out_hw[1])
    a_h = jnp.asarray(_interp_matrix(h_in, h_out, align_corners))
    a_wk = jnp.asarray(_w_kron(w_in, w_out, c, align_corners))

    def kernel(seed_ref, amp_ref, x_ref, ah_ref, awk_ref, o_clean_ref,
               o_noised_ref):
        bidx = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + bidx)
        xm = x_ref[0]  # (H_in, W_in*C); channel fold happens outside
        # HIGHEST precision: interpolation weights must not be bf16-quantized
        y1 = jnp.dot(ah_ref[:], xm, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        y = jnp.dot(y1, awk_ref[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        # Box-Muller normal noise from hardware PRNG bits
        shape = (h_out, w_out * c)
        u1b = pltpu.prng_random_bits(shape)
        u2b = pltpu.prng_random_bits(shape)
        inv = 1.0 / 4294967296.0
        u1 = (u1b.astype(jnp.float32) + 2147483648.0) * inv
        u2 = (u2b.astype(jnp.float32) + 2147483648.0) * inv
        u1 = jnp.clip(u1, 1e-7, 1.0 - 1e-7)
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        noise = r * jnp.cos(2.0 * np.pi * u2)
        o_clean_ref[0] = y
        o_noised_ref[0] = y + amp_ref[0] * noise

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # seed, amp
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h_in, w_in * c), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h_out, h_in), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in * c, w_out * c), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h_out, w_out * c), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_out, w_out * c), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    clean, noised = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, h_out, w_out * c), jnp.float32),
                   jax.ShapeDtypeStruct((b, h_out, w_out * c), jnp.float32)],
    )(jnp.asarray(seed, jnp.int32).reshape(1),
      jnp.asarray(amp, jnp.float32).reshape(1),
      x.astype(jnp.float32).reshape(b, h_in, w_in * c), a_h, a_wk)
    return (clean.reshape(b, h_out, w_out, c),
            noised.reshape(b, h_out, w_out, c))
