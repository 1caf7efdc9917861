"""Tests for per-scale LR plans and param partitioning (train_image.py:51-83)."""

import jax.numpy as jnp
import numpy as np

from hpvaegan_tpu.config import Config
from hpvaegan_tpu.training.partition import (lr_tree_for, make_lr_plan,
                                             merge_params, split_params)


def _params(body_len):
    return {"encode": {"w": jnp.zeros(2)}, "decoder": {"w": jnp.ones(2)},
            "body": [{"w": jnp.full(2, float(i))} for i in range(body_len)]}


def test_vae_scale_plan_trains_encoder_decoder():
    cfg = Config(vae_levels=3, lr_g=1e-3, lr_scale=0.2, train_depth=1)
    plan = make_lr_plan(cfg, scale_idx=1, body_len=1)
    assert plan["encode"] == plan["decoder"] == 1e-3 * 0.2  # lr_g*lr_scale^1
    assert plan["body"] == [1e-3]


def test_gan_scale_plan_only_top_blocks():
    cfg = Config(vae_levels=3, lr_g=1e-3, lr_scale=0.2, train_depth=2)
    plan = make_lr_plan(cfg, scale_idx=4, body_len=4)
    assert plan["encode"] is None and plan["decoder"] is None
    # depth = min(2, 4-3+1) = 2 -> last two blocks at lr_g*0.2, lr_g
    assert plan["body"][:2] == [None, None]
    np.testing.assert_allclose(plan["body"][2], 1e-3 * 0.2)
    np.testing.assert_allclose(plan["body"][3], 1e-3)


def test_train_all_small_body():
    cfg = Config(vae_levels=1, lr_g=1.0, lr_scale=0.5, train_depth=3,
                 train_all=True)
    plan = make_lr_plan(cfg, scale_idx=2, body_len=2)
    assert plan["encode"] == plan["decoder"] == 0.25  # lr_scale^scale_idx
    assert plan["body"] == [0.5, 1.0]


def test_split_merge_roundtrip():
    cfg = Config(vae_levels=3, train_depth=1)
    params = _params(4)
    plan = make_lr_plan(cfg, scale_idx=4, body_len=4)
    trainable, frozen = split_params(params, plan)
    assert "encode" not in trainable and "encode" in frozen
    assert set(trainable["body"]) == {3}
    merged = merge_params(trainable, frozen)
    for i in range(4):
        np.testing.assert_array_equal(np.asarray(merged["body"][i]["w"]),
                                      np.asarray(params["body"][i]["w"]))
    lrs = lr_tree_for(trainable, plan)
    assert lrs["body"][3]["w"] == plan["body"][3]
