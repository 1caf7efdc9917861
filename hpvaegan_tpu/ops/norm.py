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
                    momentum: float = 0.9, eps: float = 1e-5):
    """Channels-last batchnorm over all non-channel axes. Returns (y, new_state)."""
    axes = tuple(range(x.ndim - 1))
    if train:
        # stats in f32 even when activations flow in bf16
        xf = x.astype(jnp.float32)
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
