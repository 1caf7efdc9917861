"""InceptionV3 FID feature blocks in JAX.

Reference (src/sinFID/inception.py:6-144) hub-loads a pretrained MindSpore
InceptionV3 and slices it into 4 feature blocks (64/192/768/2048-d). SIFID
uses dims=64 by default (fid_score.py:208-211) => only block 0 runs.

Here blocks 0 (64-d) and 1 (192-d) are implemented faithfully after the
pytorch-fid slicing (Conv2d_1a..MaxPool_3a; Conv2d_3b..MaxPool_5a). The
768/2048-d Mixed-block features are not yet implemented (SIFID never uses
them by default). Weights load from an .npz (HPVAEGAN_INCEPTION_WEIGHTS env
var or weights= arg); without weights a seeded random init is used — still a
fixed feature extractor, so RELATIVE sinFID comparisons remain meaningful,
but absolute values are not comparable to the pretrained-features metric.
Input convention matches the reference: float images in [0,1], NHWC; scaled
internally to [-1,1] (inception.py:133-134).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

BLOCK_INDEX_BY_DIM = {64: 0, 192: 1, 768: 2, 2048: 3}

# (name, cin, cout, kernel, stride, pad) per block
_BLOCK0 = [("Conv2d_1a_3x3", 3, 32, 3, 2, 0),
           ("Conv2d_2a_3x3", 32, 32, 3, 1, 0),
           ("Conv2d_2b_3x3", 32, 64, 3, 1, 1)]
_BLOCK1 = [("Conv2d_3b_1x1", 64, 80, 1, 1, 0),
           ("Conv2d_4a_3x3", 80, 192, 3, 1, 0)]


def _init_conv_bn(key, name, cin, cout, k):
    kw = jax.random.split(key, 1)[0]
    fan = cin * k * k
    return {
        f"{name}.w": np.asarray(jax.random.normal(kw, (k, k, cin, cout))
                                ) / np.sqrt(fan),
        f"{name}.bn_gamma": np.ones((cout,), np.float32),
        f"{name}.bn_beta": np.zeros((cout,), np.float32),
        f"{name}.bn_mean": np.zeros((cout,), np.float32),
        f"{name}.bn_var": np.ones((cout,), np.float32),
    }


class InceptionV3:
    """Feature extractor: __call__(x) -> list of requested block features
    (NHWC). Mirrors the reference class surface (inception.py:6-144)."""

    BLOCK_INDEX_BY_DIM = BLOCK_INDEX_BY_DIM

    def __init__(self, output_blocks: List[int] = (0,),
                 weights: Optional[str] = None, seed: int = 0):
        self.output_blocks = sorted(output_blocks)
        self.last_needed_block = max(output_blocks)
        if self.last_needed_block > 1:
            raise NotImplementedError(
                "InceptionV3 Mixed blocks (768/2048-d) not implemented yet; "
                "SIFID default dims=64 uses block 0 only")
        weights = weights or os.environ.get("HPVAEGAN_INCEPTION_WEIGHTS", "")
        if weights and os.path.exists(weights):
            self.params = {k: np.asarray(v) for k, v in np.load(weights).items()}
            self.pretrained = True
        else:
            key = jax.random.PRNGKey(seed)
            self.params = {}
            for i, spec in enumerate(_BLOCK0 + _BLOCK1):
                name, cin, cout, k, _, _ = spec
                self.params.update(_init_conv_bn(
                    jax.random.fold_in(key, i), name, cin, cout, k))
            self.pretrained = False
        params = {k: jnp.asarray(v) for k, v in self.params.items()}

        def forward(x):
            # [0,1] -> [-1,1] (reference inception.py:133-134)
            x = x * 2.0 - 1.0
            outs = []

            def conv_bn(x, spec):
                name, _, _, _, stride, pad = spec
                w = params[f"{name}.w"]
                y = jax.lax.conv_general_dilated(
                    x, w, (stride, stride), [(pad, pad), (pad, pad)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                inv = jax.lax.rsqrt(params[f"{name}.bn_var"] + 1e-3) * \
                    params[f"{name}.bn_gamma"]
                y = (y - params[f"{name}.bn_mean"]) * inv + \
                    params[f"{name}.bn_beta"]
                return jax.nn.relu(y)

            for spec in _BLOCK0:
                x = conv_bn(x, spec)
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 3, 3, 1), (1, 2, 2, 1),
                                      "VALID")
            if 0 in self.output_blocks:
                outs.append(x)
            if self.last_needed_block >= 1:
                for spec in _BLOCK1:
                    x = conv_bn(x, spec)
                x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                          (1, 3, 3, 1), (1, 2, 2, 1),
                                          "VALID")
                if 1 in self.output_blocks:
                    outs.append(x)
            return outs

        self._forward = jax.jit(forward)

    def __call__(self, x) -> List[jnp.ndarray]:
        """x: (B, H, W, 3) float in [0,1]."""
        return self._forward(jnp.asarray(x, jnp.float32))
