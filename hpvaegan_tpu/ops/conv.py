"""Channels-last convolution wrappers (NHWC / NDHWC).

TPU-first layout choice: channels-last puts the channel dim on the 128-lane
axis (nfc=64, latent_dim=128 in the reference defaults), which is what XLA's
TPU conv emitter tiles onto the MXU. The reference uses NCHW/NCDHW MindSpore
convs (src/modules/networks_2d.py:47-49, networks_3d.py:48-50); layout here is
an internal choice — IO boundaries convert.

Weight layout: HWIO (2D) / DHWIO (3D). Init: Normal(std=0.02, mean=0)
matching the reference (networks_2d.py:48 `Normal(0.02, 0.0)`).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax


def normal_init(key, shape, std=0.02, mean=0.0, dtype=jnp.float32):
    return mean + std * jax.random.normal(key, shape, dtype)


def conv2d_init(key, in_ch: int, out_ch: int, ker: int, bias: bool = True) -> Dict:
    params = {"w": normal_init(key, (ker, ker, in_ch, out_ch))}
    if bias:
        params["b"] = jnp.zeros((out_ch,), jnp.float32)
    return params


def conv3d_init(key, in_ch: int, out_ch: int, ker: int, bias: bool = True) -> Dict:
    params = {"w": normal_init(key, (ker, ker, ker, in_ch, out_ch))}
    if bias:
        params["b"] = jnp.zeros((out_ch,), jnp.float32)
    return params


def _conv(x, w, stride, padding, dims2d: bool, compute_dtype=None):
    n_spatial = 2 if dims2d else 3
    if isinstance(padding, int):
        padding = [(padding, padding)] * n_spatial
    dn = ("NHWC", "HWIO", "NHWC") if dims2d else ("NDHWC", "DHWIO", "NDHWC")
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    # Output stays in the compute dtype: profiling showed the per-conv
    # cast-back to f32 nullified bf16 gains (the step is VPU/bandwidth-bound,
    # so activations must FLOW in bf16 through BN/act/resize, not just hit
    # the MXU in bf16). No preferred_element_type: a mixed bf16-operand /
    # f32-output conv is not transposable under jax.grad (the WGAN-GP
    # double-backward hits that); MXU accumulation is f32 internally anyway.
    return lax.conv_general_dilated(
        x, w,
        window_strides=(stride,) * n_spatial,
        padding=padding,
        dimension_numbers=dn,
    )


def conv2d_apply(params: Dict, x: jnp.ndarray, stride: int = 1, padding=0,
                 compute_dtype=None) -> jnp.ndarray:
    out = _conv(x, params["w"], stride, padding, True, compute_dtype)
    if "b" in params:
        out = out + params["b"].astype(out.dtype)
    return out


def conv3d_apply(params: Dict, x: jnp.ndarray, stride: int = 1, padding=0,
                 compute_dtype=None) -> jnp.ndarray:
    out = _conv(x, params["w"], stride, padding, False, compute_dtype)
    if "b" in params:
        out = out + params["b"].astype(out.dtype)
    return out


def reflect_pad(x: jnp.ndarray, pad: int, dims2d: bool = True) -> jnp.ndarray:
    """REFLECT padding on spatial axes (reference: networks_2d.py:64-65,
    networks_3d.py:65-68 — the bn=False spectral-norm block variant)."""
    if pad == 0:
        return x
    if dims2d:
        cfg = [(0, 0), (pad, pad), (pad, pad), (0, 0)]
    else:
        cfg = [(0, 0), (pad, pad), (pad, pad), (pad, pad), (0, 0)]
    return jnp.pad(x, cfg, mode="reflect")


def prelu_init(num_parameters: int = 1) -> dict:
    """Learnable PReLU parameter (reference registry: networks_2d.py:21,
    nn.PReLU — one shared slope, init 0.25)."""
    return {"alpha": jnp.full((num_parameters,), 0.25, jnp.float32)}


def prelu_apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    alpha = params["alpha"].astype(x.dtype)
    # broadcast over the channel (last) axis when per-channel
    return jnp.where(x >= 0, x, alpha * x)


def activation(x: jnp.ndarray, act: str,
               act_params: dict | None = None) -> jnp.ndarray:
    """Activations (reference: networks_2d.py:16-24; MindSpore LeakyReLU
    default alpha=0.2). 'prelu' is LEARNABLE when act_params is provided
    (nn.PReLU), else a fixed 0.25-slope stand-in.

    Like the reference registry, relu/elu/selu/prelu are API surface only:
    every network call site hardcodes act='lrelu' or act=None (reference
    networks_2d.py:45,57,80-152), so no model construction path reaches
    them. They exist for parity and for custom blocks built on this op."""
    if act == "relu":
        return jax.nn.relu(x)
    if act == "lrelu":
        return jax.nn.leaky_relu(x, 0.2)
    if act == "elu":
        return jax.nn.elu(x)
    if act == "selu":
        return jax.nn.selu(x)
    if act == "prelu":
        if act_params is not None:
            return prelu_apply(act_params, x)
        return jax.nn.leaky_relu(x, 0.25)
    raise ValueError(f"unknown activation: {act}")
