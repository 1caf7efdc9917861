"""Train-state containers (registered pytrees) for one pyramid scale."""

from __future__ import annotations

from typing import Any

import jax


@jax.tree_util.register_pytree_node_class
class ScaleTrainState:
    """Everything a per-scale jitted step mutates: generator params/state,
    discriminator params/state, both optimizer states, and the PRNG key.

    The reference equivalent is the pair of TrainOneStepCells plus the
    mutable Parameters inside the Cells (train_image.py:42-91)."""

    def __init__(self, g_params: Any, g_state: Any, d_params: Any, d_state: Any,
                 opt_g: Any, opt_d: Any, key: Any):
        self.g_params = g_params
        self.g_state = g_state
        self.d_params = d_params
        self.d_state = d_state
        self.opt_g = opt_g
        self.opt_d = opt_d
        self.key = key

    def tree_flatten(self):
        children = (self.g_params, self.g_state, self.d_params, self.d_state,
                    self.opt_g, self.opt_d, self.key)
        return children, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(*children)
