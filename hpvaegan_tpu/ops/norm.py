"""BatchNorm with explicit carried state.

The reference uses nn.BatchNorm2d/3d with gamma ~ Normal(mean=1, std=0.02)
(networks_2d.py:51, networks_3d.py:52); MindSpore semantics: train mode uses
batch statistics and updates moving stats with momentum 0.9
(moving = 0.9*moving + 0.1*batch); eval mode uses moving stats. Here the
moving stats are explicit state threaded through the step (no mutation).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def batchnorm_init(key, ch: int) -> Tuple[Dict, Dict]:
    params = {
        "gamma": 1.0 + 0.02 * jax.random.normal(key, (ch,), jnp.float32),
        "beta": jnp.zeros((ch,), jnp.float32),
    }
    state = {
        "mean": jnp.zeros((ch,), jnp.float32),
        "var": jnp.ones((ch,), jnp.float32),
    }
    return params, state


def batchnorm_apply(params: Dict, state: Dict, x: jnp.ndarray, train: bool,
                    momentum: float = 0.9, eps: float = 1e-5,
                    groups: int = 1):
    """Channels-last batchnorm over all non-channel axes. Returns (y, new_state).

    groups > 1 splits the batch into equal contiguous halves that each get
    their OWN batch statistics — a width-G*B forward then reproduces G
    separate width-B forwards bit-for-bit (incl. the sequential moving-stat
    updates, group 0 first). Used to fuse the G step's reconstruction and
    fake passes into one graph without changing the training math."""
    if train:
        # stats in f32 even when activations flow in bf16
        xf = x.astype(jnp.float32)
        if groups > 1:
            g = groups
            xg = xf.reshape((g, -1) + xf.shape[1:])
            axes = tuple(range(1, xg.ndim - 1))
            mean_g = jnp.mean(xg, axes)  # (g, C)
            var_g = jnp.var(xg, axes)
            # sequential moving-stat fold: group 0's update applied first
            m, v = state["mean"], state["var"]
            for i in range(g):
                m = momentum * m + (1 - momentum) * mean_g[i]
                v = momentum * v + (1 - momentum) * var_g[i]
            new_state = {"mean": m, "var": v}
            inv = jax.lax.rsqrt(var_g + eps) * params["gamma"]  # (g, C)
            shape = (g, 1) + (1,) * (x.ndim - 2) + (x.shape[-1],)
            xr = x.reshape((g, -1) + x.shape[1:])
            yg = (xr - mean_g.reshape(shape).astype(x.dtype)) \
                * inv.reshape(shape).astype(x.dtype) \
                + params["beta"].astype(x.dtype)
            return yg.reshape(x.shape), new_state
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(xf, axes)
        var = jnp.var(xf, axes)
        new_state = {
            "mean": momentum * state["mean"] + (1 - momentum) * mean,
            "var": momentum * state["var"] + (1 - momentum) * var,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps) * params["gamma"]
    y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype) \
        + params["beta"].astype(x.dtype)
    return y, new_state
