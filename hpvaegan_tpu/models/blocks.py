"""Shared 2D/3D building blocks as pure functions over (params, state) pytrees.

Reference blocks (src/modules/networks_2d.py:44-82, networks_3d.py:45-86):
  ConvBlock   = Conv(Normal 0.02) + BatchNorm(gamma~N(1,0.02)) + LeakyReLU(0.2)
  ConvBlockSN = spectral-norm Conv + act        (bn=True variant)
              | ReflectPad + plain Conv + act   (bn=False variant; 3D one is bias-free)
Note the reference's "bn" flag on SN blocks selects SN vs reflect-pad conv —
there is no actual batchnorm inside SN blocks (so none here either).

`ndim` is 2 for images, 3 for videos; weight/bias layouts are channels-last.
State pytrees mirror params pytrees ({} where a block is stateless).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.conv import (activation, conv2d_init, conv3d_init, conv2d_apply,
                        conv3d_apply, prelu_init, reflect_pad)
from ..ops.norm import batchnorm_apply, batchnorm_init
from ..ops.spectral_norm import sn_conv_apply, sn_conv_init


def _conv_init(key, cin, cout, ker, ndim, bias=True):
    return conv2d_init(key, cin, cout, ker, bias) if ndim == 2 \
        else conv3d_init(key, cin, cout, ker, bias)


def _conv_apply(params, x, stride, padding, ndim, compute_dtype=None):
    fn = conv2d_apply if ndim == 2 else conv3d_apply
    return fn(params, x, stride, padding, compute_dtype)


# --- ConvBlock: conv + BN? + act? ---

def conv_block_init(key, cin: int, cout: int, ker: int, ndim: int,
                    bn: bool = True, act: Optional[str] = "lrelu"
                    ) -> Tuple[Dict, Dict]:
    kc, kb = jax.random.split(key)
    params: Dict = {"conv": _conv_init(kc, cin, cout, ker, ndim)}
    state: Dict = {}
    if bn:
        params["bn"], state["bn"] = batchnorm_init(kb, cout)
    if act == "prelu":  # learnable slope (reference registry nn.PReLU)
        params["act"] = prelu_init()
    return params, state


def conv_block_apply(params: Dict, state: Dict, x, *, padding: int,
                     stride: int = 1, act: Optional[str] = "lrelu",
                     train: bool = False, ndim: int = 2,
                     compute_dtype=None,
                     bn_groups: int = 1) -> Tuple[jnp.ndarray, Dict]:
    y = _conv_apply(params["conv"], x, stride, padding, ndim, compute_dtype)
    new_state: Dict = {}
    if "bn" in params:
        y, new_state["bn"] = batchnorm_apply(params["bn"], state["bn"], y,
                                             train, groups=bn_groups)
    if act is not None:
        y = activation(y, act, act_params=params.get("act"))
    return y, new_state


# --- ConvBlockSN: spectral-norm conv (sn=True) or reflect-pad conv (sn=False) ---

def sn_block_init(key, cin: int, cout: int, ker: int, ndim: int,
                  sn: bool = True) -> Tuple[Dict, Dict]:
    if sn:
        params_sn, state_sn = sn_conv_init(key, cin, cout, ker, ndim)
        return {"snconv": params_sn}, {"sn": state_sn}
    # reflect-pad variant: 2D has bias (networks_2d.py:66-68),
    # 3D is bias-free (networks_3d.py:69-71)
    return {"conv": _conv_init(key, cin, cout, ker, ndim, bias=(ndim == 2))}, {}


def sn_block_apply(params: Dict, state: Dict, x, *, padding: int,
                   stride: int = 1, act: Optional[str] = "lrelu",
                   ndim: int = 2, compute_dtype=None) -> Tuple[jnp.ndarray, Dict]:
    new_state: Dict = {}
    if "snconv" in params:
        y, new_state["sn"] = sn_conv_apply(params["snconv"], state["sn"], x,
                                           stride, padding, compute_dtype)
    else:
        y = reflect_pad(x, padding, dims2d=(ndim == 2))
        y = _conv_apply(params["conv"], x=y, stride=stride, padding=0,
                        ndim=ndim, compute_dtype=compute_dtype)
    if act is not None:
        y = activation(y, act)
    return y, new_state


# --- FeatureExtractor: SN block stack (networks_2d.py:73-82) ---

def feature_extractor_init(key, cin: int, cout: int, ker: int, ndim: int,
                           num_blocks: int = 2,
                           return_linear: bool = False) -> Tuple[List, List]:
    keys = jax.random.split(key, num_blocks + 1)
    params, state = [], []
    p, s = sn_block_init(keys[0], cin, cout, ker, ndim)
    params.append(p), state.append(s)
    for i in range(num_blocks - 1):
        p, s = sn_block_init(keys[1 + i], cout, cout, ker, ndim)
        params.append(p), state.append(s)
    p, s = sn_block_init(keys[num_blocks], cout, cout, ker, ndim,
                         sn=not return_linear)
    params.append(p), state.append(s)
    return params, state


def feature_extractor_apply(params: List, state: List, x, *, ker: int,
                            ndim: int, return_linear: bool = False,
                            compute_dtype=None) -> Tuple[jnp.ndarray, List]:
    pad = ker // 2
    new_state = []
    n = len(params)
    for i, (p, s) in enumerate(zip(params, state)):
        last = i == n - 1
        act = None if (last and return_linear) else "lrelu"
        x, ns = sn_block_apply(p, s, x, padding=pad, act=act, ndim=ndim,
                               compute_dtype=compute_dtype)
        new_state.append(ns)
    return x, new_state


# --- "head + num_layer blocks + tail conv" stack: used for the decoder and
#     every refinement stage (networks_2d.py:207-213, 224-235) ---

def conv_stack_init(key, cin: int, mid: int, cout: int, ker: int,
                    num_layer: int, ndim: int) -> Tuple[Dict, Dict]:
    keys = jax.random.split(key, num_layer + 2)
    blocks_p, blocks_s = [], []
    p, s = conv_block_init(keys[0], cin, mid, ker, ndim)
    blocks_p.append(p), blocks_s.append(s)
    for i in range(num_layer):
        p, s = conv_block_init(keys[1 + i], mid, mid, ker, ndim)
        blocks_p.append(p), blocks_s.append(s)
    tail = _conv_init(keys[-1], mid, cout, ker, ndim)
    return {"blocks": blocks_p, "tail": tail}, {"blocks": blocks_s}


def conv_stack_apply(params: Dict, state: Dict, x, *, ker: int, padd: int,
                     train: bool, ndim: int, compute_dtype=None,
                     bn_groups: int = 1) -> Tuple[jnp.ndarray, Dict]:
    new_blocks = []
    for p, s in zip(params["blocks"], state["blocks"]):
        x, ns = conv_block_apply(p, s, x, padding=padd, train=train, ndim=ndim,
                                 compute_dtype=compute_dtype,
                                 bn_groups=bn_groups)
        new_blocks.append(ns)
    x = _conv_apply(params["tail"], x, 1, ker // 2, ndim, compute_dtype)
    return x, {"blocks": new_blocks}
