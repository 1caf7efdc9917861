"""InceptionV3 FID feature blocks in JAX — all four blocks (64/192/768/2048-d).

Reference (src/sinFID/inception.py:6-144) hub-loads a pretrained MindSpore
InceptionV3 and slices it into 4 feature blocks. SIFID uses dims=64 by
default (fid_score.py:208-211) => block 0; the full Mixed-block stack is
implemented so all BLOCK_INDEX_BY_DIM choices work, with torchvision-style
parameter names so pretrained weights can be supplied as an .npz
(HPVAEGAN_INCEPTION_WEIGHTS env var or weights=): keys "<module>.<conv>.w",
"<...>.bn_gamma/bn_beta/bn_mean/bn_var", conv weights in HWIO layout.

Without a weights file a seeded random init is used — still a fixed feature
extractor, so RELATIVE sinFID comparisons remain meaningful, but absolute
values are not comparable to the pretrained-features metric.

Input convention matches the reference: float images in [0,1], NHWC; scaled
internally to [-1,1] (inception.py:133-134). BN eps 1e-3 (torchvision).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BLOCK_INDEX_BY_DIM = {64: 0, 192: 1, 768: 2, 2048: 3}

# conv spec: (name, cout, (kh, kw), (sh, sw), (ph, pw))
Conv = Tuple[str, int, Tuple[int, int], Tuple[int, int], Tuple[int, int]]


def _c(name, cout, k, s=(1, 1), p=(0, 0)) -> Conv:
    return (name, cout, k, s, p)


def _inception_a(prefix: str, pool_features: int):
    """torchvision InceptionA."""
    return {
        "branches": [
            [_c(f"{prefix}.branch1x1", 64, (1, 1))],
            [_c(f"{prefix}.branch5x5_1", 48, (1, 1)),
             _c(f"{prefix}.branch5x5_2", 64, (5, 5), p=(2, 2))],
            [_c(f"{prefix}.branch3x3dbl_1", 64, (1, 1)),
             _c(f"{prefix}.branch3x3dbl_2", 96, (3, 3), p=(1, 1)),
             _c(f"{prefix}.branch3x3dbl_3", 96, (3, 3), p=(1, 1))],
            [("avgpool", None, (3, 3), (1, 1), (1, 1)),
             _c(f"{prefix}.branch_pool", pool_features, (1, 1))],
        ],
    }


def _inception_b(prefix: str):
    return {
        "branches": [
            [_c(f"{prefix}.branch3x3", 384, (3, 3), s=(2, 2))],
            [_c(f"{prefix}.branch3x3dbl_1", 64, (1, 1)),
             _c(f"{prefix}.branch3x3dbl_2", 96, (3, 3), p=(1, 1)),
             _c(f"{prefix}.branch3x3dbl_3", 96, (3, 3), s=(2, 2))],
            [("maxpool", None, (3, 3), (2, 2), (0, 0))],
        ],
    }


def _inception_c(prefix: str, c7: int):
    return {
        "branches": [
            [_c(f"{prefix}.branch1x1", 192, (1, 1))],
            [_c(f"{prefix}.branch7x7_1", c7, (1, 1)),
             _c(f"{prefix}.branch7x7_2", c7, (1, 7), p=(0, 3)),
             _c(f"{prefix}.branch7x7_3", 192, (7, 1), p=(3, 0))],
            [_c(f"{prefix}.branch7x7dbl_1", c7, (1, 1)),
             _c(f"{prefix}.branch7x7dbl_2", c7, (7, 1), p=(3, 0)),
             _c(f"{prefix}.branch7x7dbl_3", c7, (1, 7), p=(0, 3)),
             _c(f"{prefix}.branch7x7dbl_4", c7, (7, 1), p=(3, 0)),
             _c(f"{prefix}.branch7x7dbl_5", 192, (1, 7), p=(0, 3))],
            [("avgpool", None, (3, 3), (1, 1), (1, 1)),
             _c(f"{prefix}.branch_pool", 192, (1, 1))],
        ],
    }


def _inception_d(prefix: str):
    return {
        "branches": [
            [_c(f"{prefix}.branch3x3_1", 192, (1, 1)),
             _c(f"{prefix}.branch3x3_2", 320, (3, 3), s=(2, 2))],
            [_c(f"{prefix}.branch7x7x3_1", 192, (1, 1)),
             _c(f"{prefix}.branch7x7x3_2", 192, (1, 7), p=(0, 3)),
             _c(f"{prefix}.branch7x7x3_3", 192, (7, 1), p=(3, 0)),
             _c(f"{prefix}.branch7x7x3_4", 192, (3, 3), s=(2, 2))],
            [("maxpool", None, (3, 3), (2, 2), (0, 0))],
        ],
    }


def _inception_e(prefix: str):
    # pytorch-fid's FIDInceptionE_2 (Mixed_7c) replaces the branch avg-pool
    # with a MAX pool to match the original TF-FID network
    pool_kind = "maxpool" if prefix == "Mixed_7c" else "avgpool"
    return {
        "branches": [
            [_c(f"{prefix}.branch1x1", 320, (1, 1))],
            # split branch: 1x1 then parallel (1x3, 3x1) concat
            [_c(f"{prefix}.branch3x3_1", 384, (1, 1)),
             ("split", [_c(f"{prefix}.branch3x3_2a", 384, (1, 3), p=(0, 1)),
                        _c(f"{prefix}.branch3x3_2b", 384, (3, 1), p=(1, 0))])],
            [_c(f"{prefix}.branch3x3dbl_1", 448, (1, 1)),
             _c(f"{prefix}.branch3x3dbl_2", 384, (3, 3), p=(1, 1)),
             ("split", [_c(f"{prefix}.branch3x3dbl_3a", 384, (1, 3), p=(0, 1)),
                        _c(f"{prefix}.branch3x3dbl_3b", 384, (3, 1),
                           p=(1, 0))])],
            [(pool_kind, None, (3, 3), (1, 1), (1, 1)),
             _c(f"{prefix}.branch_pool", 192, (1, 1))],
        ],
    }


_STEM0 = [_c("Conv2d_1a_3x3", 32, (3, 3), s=(2, 2)),
          _c("Conv2d_2a_3x3", 32, (3, 3)),
          _c("Conv2d_2b_3x3", 64, (3, 3), p=(1, 1))]
_STEM1 = [_c("Conv2d_3b_1x1", 80, (1, 1)),
          _c("Conv2d_4a_3x3", 192, (3, 3))]
_MIXED2 = [_inception_a("Mixed_5b", 32), _inception_a("Mixed_5c", 64),
           _inception_a("Mixed_5d", 64), _inception_b("Mixed_6a"),
           _inception_c("Mixed_6b", 128), _inception_c("Mixed_6c", 160),
           _inception_c("Mixed_6d", 160), _inception_c("Mixed_6e", 192)]
_MIXED3 = [_inception_d("Mixed_7a"), _inception_e("Mixed_7b"),
           _inception_e("Mixed_7c")]


def _iter_convs(specs, cin: int):
    """Yield (name, cin, cout, k) for every conv, tracking channel flow."""
    for spec in specs:
        if isinstance(spec, dict):  # inception module
            outs = []
            for branch in spec["branches"]:
                b_cin = cin
                b_out = cin
                for item in branch:
                    if item[0] == "split":
                        s_out = 0
                        for sub in item[1]:
                            yield (sub[0], b_cin, sub[1], sub[2])
                            s_out += sub[1]
                        b_out = s_out
                        b_cin = s_out
                    elif item[0] in ("avgpool", "maxpool"):
                        continue
                    else:
                        name, cout, k, _, _ = item
                        yield (name, b_cin, cout, k)
                        b_cin = cout
                        b_out = cout
                outs.append(b_out)
            cin = sum(outs)
        else:
            name, cout, k, _, _ = spec
            yield (name, cin, cout, k)
            cin = cout


def _all_specs(last_block: int):
    specs = list(_STEM0)
    if last_block >= 1:
        specs += _STEM1
    if last_block >= 2:
        specs += _MIXED2
    if last_block >= 3:
        specs += _MIXED3
    return specs


def _init_params(last_block: int, seed: int) -> Dict[str, np.ndarray]:
    key = jax.random.PRNGKey(seed)
    params: Dict[str, np.ndarray] = {}
    for i, (name, cin, cout, k) in enumerate(_iter_convs(_all_specs(last_block),
                                                         3)):
        fan = cin * k[0] * k[1]
        params[f"{name}.w"] = np.asarray(jax.random.normal(
            jax.random.fold_in(key, i), (k[0], k[1], cin, cout))
        ) / np.sqrt(fan)
        params[f"{name}.bn_gamma"] = np.ones((cout,), np.float32)
        params[f"{name}.bn_beta"] = np.zeros((cout,), np.float32)
        params[f"{name}.bn_mean"] = np.zeros((cout,), np.float32)
        params[f"{name}.bn_var"] = np.ones((cout,), np.float32)
    return params


class InceptionV3:
    """Feature extractor: __call__(x) -> list of requested block features
    (NHWC). Mirrors the reference class surface (inception.py:6-144)."""

    BLOCK_INDEX_BY_DIM = BLOCK_INDEX_BY_DIM

    def __init__(self, output_blocks: List[int] = (0,),
                 weights: Optional[str] = None, seed: int = 0):
        self.output_blocks = sorted(output_blocks)
        self.last_needed_block = max(output_blocks)
        weights = weights or os.environ.get("HPVAEGAN_INCEPTION_WEIGHTS", "")
        if weights and not os.path.exists(weights):
            # an EXPLICIT weights request must not silently degrade to
            # random features (plausible-looking but meaningless SIFID)
            raise FileNotFoundError(
                f"Inception weights file not found: {weights}")
        if weights:
            self.params = {k: np.asarray(v) for k, v in np.load(weights).items()}
            self.pretrained = True
        else:
            self.params = _init_params(self.last_needed_block, seed)
            self.pretrained = False
        params = {k: jnp.asarray(v) for k, v in self.params.items()}
        out_blocks = self.output_blocks
        last = self.last_needed_block

        def conv_bn(x, name, stride, pad):
            w = params[f"{name}.w"]
            y = jax.lax.conv_general_dilated(
                x, w, stride, [(pad[0], pad[0]), (pad[1], pad[1])],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            inv = jax.lax.rsqrt(params[f"{name}.bn_var"] + 1e-3) * \
                params[f"{name}.bn_gamma"]
            y = (y - params[f"{name}.bn_mean"]) * inv + params[f"{name}.bn_beta"]
            return jax.nn.relu(y)

        def pool(x, kind, k, s, p):
            pads = [(0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0)]
            if kind == "maxpool":
                return jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, k[0], k[1], 1),
                    (1, s[0], s[1], 1), pads)
            summed = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, k[0], k[1], 1), (1, s[0], s[1], 1),
                pads)
            # pytorch-fid's FIDInceptionA/C/E branch pools use
            # avg_pool2d(count_include_pad=False): divide by the VALID
            # window count at padded borders. The recommended pretrained
            # weights (tools/metric_weights.py) are the pytorch-fid file,
            # so FID-variant semantics are the parity target.
            counts = jax.lax.reduce_window(
                jnp.ones_like(x), 0.0, jax.lax.add, (1, k[0], k[1], 1),
                (1, s[0], s[1], 1), pads)
            return summed / counts

        def run_branch(x, branch):
            for item in branch:
                if item[0] == "split":
                    x = jnp.concatenate(
                        [conv_bn(x, s[0], s[3], s[4]) for s in item[1]],
                        axis=-1)
                elif item[0] in ("avgpool", "maxpool"):
                    x = pool(x, item[0], item[2], item[3], item[4])
                else:
                    name, _, _, s, p = item
                    x = conv_bn(x, name, s, p)
            return x

        def run_specs(x, specs):
            for spec in specs:
                if isinstance(spec, dict):
                    x = jnp.concatenate(
                        [run_branch(x, b) for b in spec["branches"]], axis=-1)
                else:
                    name, _, _, s, p = spec
                    x = conv_bn(x, name, s, p)
            return x

        def forward(x):
            x = x * 2.0 - 1.0  # [0,1] -> [-1,1] (inception.py:133-134)
            outs = []
            x = run_specs(x, _STEM0)
            x = pool(x, "maxpool", (3, 3), (2, 2), (0, 0))
            if 0 in out_blocks:
                outs.append(x)
            if last >= 1:
                x = run_specs(x, _STEM1)
                x = pool(x, "maxpool", (3, 3), (2, 2), (0, 0))
                if 1 in out_blocks:
                    outs.append(x)
            if last >= 2:
                x = run_specs(x, _MIXED2)
                if 2 in out_blocks:
                    outs.append(x)
            if last >= 3:
                x = run_specs(x, _MIXED3)
                x = jnp.mean(x, axis=(1, 2), keepdims=True)  # adaptive 1x1
                if 3 in out_blocks:
                    outs.append(x)
            return outs

        self._forward = jax.jit(forward)

    def __call__(self, x) -> List[jnp.ndarray]:
        """x: (B, H, W, 3) float in [0,1]."""
        return self._forward(jnp.asarray(x, jnp.float32))
