"""Per-scale trainable-parameter plans and per-block learning rates.

Reference logic (train_image.py:51-83 / train_video.py:74-105): which of
{encode, decoder, body[i]} train at a given scale, and at which LR
(lr_g * lr_scale**depth-from-top). Frozen subtrees are split out of the grad
computation entirely (the reference achieves the same by only handing the
optimizer the trainable Parameters).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax


def make_lr_plan(cfg, scale_idx: int, body_len: int) -> Dict:
    """Return {'encode': lr|None, 'decoder': lr|None, 'body': [lr|None]}."""
    enc_lr: Optional[float] = None
    dec_lr: Optional[float] = None
    body_lr: List[Optional[float]] = [None] * body_len

    def ladder(n: int) -> List[float]:
        # last n blocks, top block at lr_g, each lower block scaled by lr_scale
        return [cfg.lr_g * (cfg.lr_scale ** (n - 1 - i)) for i in range(n)]

    if not cfg.train_all:
        if cfg.vae_levels < scale_idx + 1:
            # GAN scales: only the last train_depth body blocks
            depth = min(cfg.train_depth, body_len - cfg.vae_levels + 1)
            depth = max(depth, 0)
            for i, lr in enumerate(ladder(depth)):
                body_lr[body_len - depth + i] = lr
        else:
            # VAE scales: encoder+decoder + last train_depth body blocks
            enc_lr = dec_lr = cfg.lr_g * (cfg.lr_scale ** scale_idx)
            depth = min(cfg.train_depth, body_len)
            for i, lr in enumerate(ladder(depth)):
                body_lr[body_len - depth + i] = lr
    else:
        if body_len < cfg.train_depth:
            enc_lr = dec_lr = cfg.lr_g * (cfg.lr_scale ** scale_idx)
            for i, lr in enumerate(ladder(body_len)):
                body_lr[i] = lr
        else:
            depth = cfg.train_depth
            for i, lr in enumerate(ladder(depth)):
                body_lr[body_len - depth + i] = lr

    return {"encode": enc_lr, "decoder": dec_lr, "body": body_lr}


def make_baseline_lr_plan(cfg, scale_idx: int, body_len: int,
                          has_head: bool = False,
                          has_tail: bool = False) -> Dict:
    """SinGAN-baseline plan (train_video_baselines.py:64-83): last train_depth
    body stages at the LR ladder, head trains while scale_idx < train_depth,
    tail always trains at lr_g."""
    plan: Dict = {"body": [None] * body_len}
    depth = min(cfg.train_depth, body_len)
    for i in range(depth):
        plan["body"][body_len - depth + i] = \
            cfg.lr_g * (cfg.lr_scale ** (depth - 1 - i))
    if has_head:
        plan["head"] = (cfg.lr_g * (cfg.lr_scale ** scale_idx)
                        if scale_idx - cfg.train_depth < 0 else None)
    if has_tail:
        plan["tail"] = cfg.lr_g
    return plan


def _group_names(plan: Dict):
    return [k for k in plan.keys() if k != "body"]


def split_params(params: Dict, plan: Dict) -> Tuple[Dict, Dict]:
    """Split generator params into (trainable, frozen) by the LR plan.
    Works for any param tree with a 'body' list plus named top-level groups
    (encode/decoder for HPVAEGAN, head/tail for the baselines)."""
    trainable: Dict = {"body": {}}
    frozen: Dict = {"body": {}}
    for name in _group_names(plan):
        (trainable if plan[name] is not None else frozen)[name] = params[name]
    for i, stage in enumerate(params["body"]):
        (trainable if plan["body"][i] is not None else frozen)["body"][i] = stage
    return trainable, frozen


def merge_params(trainable: Dict, frozen: Dict) -> Dict:
    """Inverse of split_params."""
    merged: Dict = {}
    for src in (trainable, frozen):
        for name, sub in src.items():
            if name != "body":
                merged[name] = sub
    body_idx = {**frozen["body"], **trainable["body"]}
    merged["body"] = [body_idx[i] for i in range(len(body_idx))]
    return merged


def lr_tree_for(trainable: Dict, plan: Dict):
    """Per-leaf LR tree matching the trainable subtree."""
    out: Dict = {"body": {}}
    for name in _group_names(plan):
        if name in trainable:
            out[name] = jax.tree_util.tree_map(lambda _: plan[name],
                                               trainable[name])
    for i, stage in trainable["body"].items():
        out["body"][i] = jax.tree_util.tree_map(lambda _: plan["body"][i], stage)
    return out
