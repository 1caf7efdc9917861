"""Spectral-norm convolution with one-step power iteration as carried state.

The reference mutates non-trainable (u, v) Parameters inside forward
(src/tools/spectral_norm.py:44-55). Functionally: (u, v) are explicit state;
each apply runs one power-iteration step on stop-gradient'd vectors, computes
sigma = u^T W v (differentiable w.r.t. W, like torch.nn.utils.spectral_norm),
normalizes the weight, and returns the new (u, v). This composes cleanly with
the WGAN-GP grad-inside-grad (losses.py) because u/v carry no gradient.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .conv import _conv, normal_init


def _l2normalize(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x), eps)


def sn_conv_init(key, in_ch: int, out_ch: int, ker: int, ndim: int = 2,
                 bias: bool = True) -> Tuple[Dict, Dict]:
    kw, ks = jax.random.split(key)
    kshape = (ker,) * ndim + (in_ch, out_ch)
    params = {"w": normal_init(kw, kshape)}
    if bias:
        params["b"] = jnp.zeros((out_ch,), jnp.float32)
    fan_in = in_ch * ker ** ndim
    ku, kv = jax.random.split(ks)
    state = {
        "u": _l2normalize(jax.random.normal(ku, (out_ch,), jnp.float32)),
        "v": _l2normalize(jax.random.normal(kv, (fan_in,), jnp.float32)),
    }
    return params, state


def spectral_normalize(w: jnp.ndarray, state: Dict,
                       power_iterations: int = 1) -> Tuple[jnp.ndarray, Dict]:
    """Return (w / sigma, new_state). w layout (*spatial, cin, cout)."""
    out_ch = w.shape[-1]
    w_mat = w.reshape(-1, out_ch).T  # (cout, fan_in)
    u = jax.lax.stop_gradient(state["u"])
    v = jax.lax.stop_gradient(state["v"])
    for _ in range(power_iterations):
        v = _l2normalize(jax.lax.stop_gradient(w_mat).T @ u)
        u = _l2normalize(jax.lax.stop_gradient(w_mat) @ v)
    sigma = u @ w_mat @ v  # differentiable w.r.t. w
    return w / sigma, {"u": u, "v": v}


def sn_conv_apply(params: Dict, state: Dict, x: jnp.ndarray, stride: int = 1,
                  padding=0, compute_dtype=None) -> Tuple[jnp.ndarray, Dict]:
    ndim = params["w"].ndim - 2
    w_bar, new_state = spectral_normalize(params["w"], state)
    if ndim == 1:
        # 1D via a height-1 2D conv (reference: spectral_norm.py:94
        # SpectualNormConv1d expand_dims trick)
        x2 = x[:, None]  # (B, 1, W, C)
        w2 = w_bar[None]  # (1, K, cin, cout)
        pad2 = [(0, 0), (padding, padding)] if isinstance(padding, int) \
            else padding
        out = _conv(x2, w2, stride, pad2, True, compute_dtype)[:, 0]
    else:
        out = _conv(x, w_bar, stride, padding, ndim == 2, compute_dtype)
    if "b" in params:
        out = out + params["b"].astype(out.dtype)
    return out, new_state
