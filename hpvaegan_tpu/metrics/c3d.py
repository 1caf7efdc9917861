"""C3D (Sports-1M architecture) feature blocks in JAX for SVFID.

The reference C3D is non-functional as shipped: it hub-loads the InceptionV3
model by name and references an undefined self.pad (src/sinFID/c3d.py:59-60,
132) — SURVEY §2 flags this as a bug to fix. This is a working C3D feature
extractor with the reference's block split (BLOCK_INDEX_BY_DIM 64/128/256/512,
c3d.py:6-142): conv1(64)+pool1 | conv2(128)+pool2 | conv3a/b(256)+pool3 |
conv4a/b(512)+pool4. Weights load from an .npz (HPVAEGAN_C3D_WEIGHTS env var
or weights=); otherwise a seeded random init (see inception.py docstring for
the relative-metric caveat). Input: (B, T, H, W, 3) float in [0,1].
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

BLOCK_INDEX_BY_DIM = {64: 0, 128: 1, 256: 2, 512: 3}

# (name, cin, cout) conv3x3x3 stacks per block; pools after each block
_BLOCKS = [
    [("conv1a", 3, 64)],
    [("conv2a", 64, 128)],
    [("conv3a", 128, 256), ("conv3b", 256, 256)],
    [("conv4a", 256, 512), ("conv4b", 512, 512)],
]
# pool window/stride per block (T, H, W); pool1 keeps time (C3D standard)
_POOLS = [(1, 2, 2), (2, 2, 2), (2, 2, 2), (2, 2, 2)]


class C3D:
    BLOCK_INDEX_BY_DIM = BLOCK_INDEX_BY_DIM

    def __init__(self, output_blocks: List[int] = (0,),
                 weights: Optional[str] = None, seed: int = 0):
        self.output_blocks = sorted(output_blocks)
        self.last_needed_block = max(output_blocks)
        weights = weights or os.environ.get("HPVAEGAN_C3D_WEIGHTS", "")
        if weights and not os.path.exists(weights):
            # an EXPLICIT weights request must not silently degrade to
            # random features (plausible-looking but meaningless SVFID)
            raise FileNotFoundError(f"C3D weights file not found: {weights}")
        if weights:
            self.params = {k: np.asarray(v) for k, v in np.load(weights).items()}
            self.pretrained = True
        else:
            key = jax.random.PRNGKey(seed)
            self.params = {}
            i = 0
            for block in _BLOCKS:
                for name, cin, cout in block:
                    fan = cin * 27
                    self.params[f"{name}.w"] = np.asarray(jax.random.normal(
                        jax.random.fold_in(key, i),
                        (3, 3, 3, cin, cout))) / np.sqrt(fan)
                    self.params[f"{name}.b"] = np.zeros((cout,), np.float32)
                    i += 1
            self.pretrained = False
        params = {k: jnp.asarray(v) for k, v in self.params.items()}

        pretrained = self.pretrained

        def forward(x):
            if pretrained:
                # the C3D-pytorch Sports-1M weights (tools/metric_weights.py)
                # consume RGB in [0, 255] (their predict pipeline: skimage
                # resize -> *255, no mean subtraction); feeding [-1,1] would
                # put conv1 ~100x below the trained input scale
                x = x * 255.0
            else:
                x = x * 2.0 - 1.0
            outs = []
            for bi, block in enumerate(_BLOCKS):
                if bi > self.last_needed_block:
                    break
                for name, _, _ in block:
                    x = jax.lax.conv_general_dilated(
                        x, params[f"{name}.w"], (1, 1, 1),
                        [(1, 1)] * 3,
                        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                    x = jax.nn.relu(x + params[f"{name}.b"])
                pt, ph, pw = _POOLS[bi]
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max,
                    (1, pt, ph, pw, 1), (1, pt, ph, pw, 1), "VALID")
                if bi in self.output_blocks:
                    outs.append(x)
            return outs

        self._forward = jax.jit(forward)

    def __call__(self, x) -> List[jnp.ndarray]:
        """x: (B, T, H, W, 3) float in [0,1]."""
        return self._forward(jnp.asarray(x, jnp.float32))
