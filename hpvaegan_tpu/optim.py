"""Optimizers: Adam + per-tensor clip-by-norm + per-block learning rates.

Reference: ClippedAdam applies nn.ClipByNorm per gradient tensor before the
Adam update (src/modules/optimizers.py:6-43), and train_image.py:51-83 builds
per-block LR groups lr_g * lr_scale**(depth-from-top). Here:
  optax.chain(per-leaf clip, scale_by_adam, per-leaf -lr scaling)
with the per-leaf LR supplied as a pytree matching the trainable params.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax


def clip_by_norm_per_leaf(clip: float) -> optax.GradientTransformation:
    """Per-tensor L2-norm clip (reference: optimizers.py:29 nn.ClipByNorm)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def _clip(g):
            norm = jnp.sqrt(jnp.sum(g.astype(jnp.float32) ** 2))
            scale = jnp.minimum(1.0, clip / jnp.maximum(norm, 1e-12))
            return (g * scale).astype(g.dtype)

        return jax.tree_util.tree_map(_clip, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def scale_by_lr_tree(lr_tree: Any) -> optax.GradientTransformation:
    """Per-leaf learning rate (descent direction: multiplies by -lr)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map(lambda u, lr: -lr * u, updates, lr_tree)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def clipped_adam(lr_tree: Any, beta1: float, beta2: float = 0.999,
                 eps: float = 1e-8, grad_clip: float = 5.0):
    """G optimizer (reference: ClippedAdam, optimizers.py:33-43)."""
    return optax.chain(
        clip_by_norm_per_leaf(grad_clip),
        optax.scale_by_adam(b1=beta1, b2=beta2, eps=eps),
        scale_by_lr_tree(lr_tree),
    )


def adam(lr: float, beta1: float, beta2: float = 0.999, eps: float = 1e-8):
    """D optimizer (reference: nn.Adam, train_image.py:42)."""
    return optax.chain(
        optax.scale_by_adam(b1=beta1, b2=beta2, eps=eps),
        optax.scale(-lr),
    )
