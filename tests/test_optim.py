"""Flat (single-buffer) optimizer parity vs the per-leaf optax chain.

The flat path (optim.flat_adam, cfg.flat_opt) must be numerically identical
to chain(clip_by_norm_per_leaf, scale_by_adam, scale_by_lr_tree). It was
built to cut XLA launch count but measured ~5% SLOWER on v5e (docs/PERF.md
round-2 table) — kept as an opt-in A/B lever, so parity stays pinned.
Reference semantics: ClippedAdam, src/modules/optimizers.py:6-43.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from hpvaegan_tpu.optim import adam, clipped_adam, flat_adam


def _tree(key):
    ks = jax.random.split(key, 5)
    return {
        "head": {"w": jax.random.normal(ks[0], (3, 3, 4, 8)),
                 "b": jax.random.normal(ks[1], (8,))},
        "body": {"0": {"w": jax.random.normal(ks[2], (2, 2, 8, 8)),
                       "gamma": jax.random.normal(ks[3], (8,))}},
        "tail": jax.random.normal(ks[4], ()),
    }


def _lr_tree(params):
    lrs = iter([5e-4, 5e-4, 1e-3, 2e-3, 5e-5])
    return jax.tree_util.tree_map(lambda _: next(lrs), params)


def _run(opt, params, n_steps=5, seed=7):
    state = opt.init(params)
    traj = []
    for i in range(n_steps):
        grads = jax.tree_util.tree_map(
            lambda p, k=i: 3.0 * jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(seed), k), p.shape),
            params)
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        traj.append(params)
    return traj


@pytest.mark.parametrize("clip", [5.0, 0.5])
def test_flat_clipped_adam_matches_chain(clip):
    params = _tree(jax.random.PRNGKey(0))
    lr_tree = _lr_tree(params)
    ref = _run(clipped_adam(lr_tree, 0.5, grad_clip=clip, flat=False), params)
    got = _run(clipped_adam(lr_tree, 0.5, grad_clip=clip, flat=True), params)
    for r, g in zip(ref, got):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6), r, g)


def test_flat_adam_scalar_lr_matches_plain_adam():
    params = _tree(jax.random.PRNGKey(1))
    ref = _run(adam(3e-4, 0.9, flat=False), params)
    got = _run(adam(3e-4, 0.9, flat=True), params)
    for r, g in zip(ref, got):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6), r, g)


def test_flat_clip_limits_per_leaf_norm():
    """A leaf with a huge gradient is clipped to norm<=clip BEFORE the Adam
    moments see it (same order as the reference chain)."""
    params = {"big": jnp.zeros((16,)), "small": jnp.zeros((4,))}
    grads = {"big": 100.0 * jnp.ones((16,)), "small": 1e-3 * jnp.ones((4,))}
    clip = 2.0
    opt = flat_adam({"big": 1.0, "small": 1.0}, 0.0, beta2=0.0,
                    eps=0.0, grad_clip=clip)
    state = opt.init(params)
    updates, new_state = opt.update(grads, state, params)
    # beta1=0 -> the first moment IS the clipped gradient; observe the clip
    # through flat_adam's OWN state buffer (tree order: "big" then "small")
    m = np.asarray(new_state.m)
    assert np.isclose(np.linalg.norm(m[:16]), clip, atol=1e-5)  # clipped
    np.testing.assert_allclose(m[16:], np.asarray(grads["small"]),
                               atol=1e-7)  # norm < clip: untouched
    # direction preserved: clipping rescales, never flips
    assert (m[:16] > 0).all()
    # and with beta1=beta2=0, eps=0 the update is exactly -sign(g) per elem
    np.testing.assert_allclose(np.asarray(updates["small"]),
                               -np.ones((4,)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(updates["big"]),
                               -np.ones((16,)), atol=1e-6)


def test_flat_adam_init_from_abstract_shapes():
    """pipeline.build_scale_bundle inits optimizer state under eval_shape —
    the flat state must be derivable from ShapeDtypeStructs."""
    params = _tree(jax.random.PRNGKey(2))
    opt = flat_adam(_lr_tree(params), 0.5, grad_clip=5.0)
    abs_state = jax.eval_shape(opt.init, params)
    real_state = opt.init(params)
    assert jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), abs_state) \
        == jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), real_state)


def test_infinite_clip_means_unclipped():
    """The baselines pass grad_clip=float('inf') to mean 'no clipping'
    (baselines_trainer.py); both implementations must treat it as clip=None
    (identical updates, no wasted clip stage)."""
    params = _tree(jax.random.PRNGKey(0))
    grads = _tree(jax.random.PRNGKey(1))
    lr = jax.tree_util.tree_map(lambda _: 1e-3, params)

    for flat in (False, True):
        inf_opt = clipped_adam(lr, 0.5, grad_clip=float("inf"), flat=flat)
        none_opt = clipped_adam(lr, 0.5, grad_clip=None, flat=flat)
        ui, _ = inf_opt.update(grads, inf_opt.init(params), params)
        un, _ = none_opt.update(grads, none_opt.init(params), params)
        for a, b in zip(jax.tree_util.tree_leaves(ui),
                        jax.tree_util.tree_leaves(un)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
