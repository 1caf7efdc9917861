"""Optimizers: Adam + per-tensor clip-by-norm + per-block learning rates.

Reference: ClippedAdam applies nn.ClipByNorm per gradient tensor before the
Adam update (src/modules/optimizers.py:6-43), and train_image.py:51-83 builds
per-block LR groups lr_g * lr_scale**(depth-from-top). Here:
  optax.chain(per-leaf clip, scale_by_adam, per-leaf -lr scaling)
with the per-leaf LR supplied as a pytree matching the trainable params.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
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


class FlatAdamState(NamedTuple):
    """Adam moments held as ONE flat f32 buffer (see flat_adam)."""
    count: jnp.ndarray  # int32 scalar
    m: jnp.ndarray      # (N,) f32
    v: jnp.ndarray      # (N,) f32


def _leaf_sizes(leaves):
    return [int(np.prod(l.shape)) if l.shape else 1 for l in leaves]


def flat_adam(lr_tree: Any, beta1: float, beta2: float = 0.999,
              eps: float = 1e-8,
              grad_clip: float | None = None) -> optax.GradientTransformation:
    """Clipped Adam executed on ONE flattened buffer instead of per-leaf ops.

    Semantically identical to chain(clip_by_norm_per_leaf, scale_by_adam,
    scale_by_lr_tree) — same per-tensor L2 clip, same bias correction — but
    the ~L param leaves' worth of tiny reductions and elementwise fusions
    (~3 XLA launches per leaf per step) collapse into: one concatenate, one
    segment-sum (all per-leaf clip norms at once), and one big elementwise
    fusion for the Adam update. On TPU the training step at batch-1 geometry
    is serialized-launch bound (docs/PERF.md), so op count is the cost model.

    lr_tree: pytree of static per-leaf learning rates matching the trainable
    params, or a scalar.
    """
    def init_fn(params):
        n = sum(_leaf_sizes(jax.tree_util.tree_leaves(params)))
        return FlatAdamState(count=jnp.zeros((), jnp.int32),
                             m=jnp.zeros((n,), jnp.float32),
                             v=jnp.zeros((n,), jnp.float32))

    def update_fn(updates, state, params=None):
        del params
        leaves, treedef = jax.tree_util.tree_flatten(updates)
        sizes = _leaf_sizes(leaves)
        flat = jnp.concatenate(
            [l.reshape(-1).astype(jnp.float32) for l in leaves])
        if grad_clip is not None:
            # all per-leaf norms in ONE sorted-segment reduction
            seg = jnp.asarray(np.repeat(np.arange(len(leaves), dtype=np.int32),
                                        sizes))
            sums = jax.ops.segment_sum(flat * flat, seg,
                                       num_segments=len(leaves),
                                       indices_are_sorted=True)
            scale = jnp.minimum(1.0, grad_clip
                                / jnp.maximum(jnp.sqrt(sums), 1e-12))
            flat = flat * scale[seg]
        if isinstance(lr_tree, (int, float)):
            lr_vec = jnp.float32(lr_tree)
        else:
            lr_leaves = jax.tree_util.tree_leaves(lr_tree)
            assert len(lr_leaves) == len(leaves), "lr_tree/param mismatch"
            lr_vec = jnp.asarray(np.concatenate(
                [np.full(s, float(lr), np.float32)
                 for s, lr in zip(sizes, lr_leaves)]))
        count = state.count + 1
        m = beta1 * state.m + (1.0 - beta1) * flat
        v = beta2 * state.v + (1.0 - beta2) * (flat * flat)
        c = count.astype(jnp.float32)
        m_hat = m / (1.0 - beta1 ** c)
        v_hat = v / (1.0 - beta2 ** c)
        upd = -lr_vec * m_hat / (jnp.sqrt(v_hat) + eps)
        out, off = [], 0
        for l, s in zip(leaves, sizes):
            out.append(upd[off:off + s].reshape(l.shape).astype(l.dtype))
            off += s
        return (jax.tree_util.tree_unflatten(treedef, out),
                FlatAdamState(count, m, v))

    return optax.GradientTransformation(init_fn, update_fn)


def clipped_adam(lr_tree: Any, beta1: float, beta2: float = 0.999,
                 eps: float = 1e-8, grad_clip: float = 5.0,
                 flat: bool = False):
    """G optimizer (reference: ClippedAdam, optimizers.py:33-43).

    flat=True runs the numerically-identical single-buffer implementation
    (flat_adam) — fewer XLA launches per step on launch-bound geometries."""
    # a non-finite clip means "unclipped" (the baselines pass float('inf'),
    # baselines_trainer.py) — skip the clip stage entirely instead of paying
    # a guaranteed-no-op segment-sum/sqrt per step on launch-bound geometry
    if grad_clip is not None and not np.isfinite(grad_clip):
        grad_clip = None
    if flat:
        return flat_adam(lr_tree, beta1, beta2, eps, grad_clip=grad_clip)
    if grad_clip is None:
        return optax.chain(
            optax.scale_by_adam(b1=beta1, b2=beta2, eps=eps),
            scale_by_lr_tree(lr_tree),
        )
    return optax.chain(
        clip_by_norm_per_leaf(grad_clip),
        optax.scale_by_adam(b1=beta1, b2=beta2, eps=eps),
        scale_by_lr_tree(lr_tree),
    )


def adam(lr: float, beta1: float, beta2: float = 0.999, eps: float = 1e-8,
         flat: bool = False):
    """D optimizer (reference: nn.Adam, train_image.py:42)."""
    if flat:
        return flat_adam(lr, beta1, beta2, eps, grad_clip=None)
    return optax.chain(
        optax.scale_by_adam(b1=beta1, b2=beta2, eps=eps),
        optax.scale(-lr),
    )
