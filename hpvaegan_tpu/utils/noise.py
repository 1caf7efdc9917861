"""Explicit-PRNG noise generation.

The reference hides RNG inside `@constexpr(reuse_result=False)` host-numpy calls
re-evaluated per step (reference: src/utils/images.py:17-37,
src/modules/networks_2d.py:27-41). TPU-native equivalent: a jax.random key is
threaded through every step and split per consumer, so noise is generated
on-device inside the jitted step (no host->device transfer per iteration).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def generate_noise(key: jax.Array, shape: Sequence[int], kind: str = "normal",
                   dtype=jnp.float32) -> jax.Array:
    """normal / bernoulli / uniform noise (reference: images.py:17-37)."""
    if kind == "normal":
        return jax.random.normal(key, tuple(shape), dtype)
    if kind in ("bernoulli", "benoulli"):  # reference spells it 'benoulli'
        return jax.random.bernoulli(key, 0.5, tuple(shape)).astype(dtype)
    if kind == "uniform":
        return jax.random.uniform(key, tuple(shape), dtype)
    raise ValueError(f"unknown noise kind: {kind}")
