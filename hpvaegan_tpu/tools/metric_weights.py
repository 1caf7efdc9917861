"""Convert pretrained metric-network weights into this framework's .npz
format (consumed via HPVAEGAN_INCEPTION_WEIGHTS / HPVAEGAN_C3D_WEIGHTS).

The reference hub-loads pretrained InceptionV3/C3D from mindspore_hub
(src/sinFID/inception.py:60-62, c3d.py:59-60 — the latter broken). This
environment has no model downloads, so sinFID defaults to seeded random
features (relative comparisons only); users with the standard weights run:

    python -m hpvaegan_tpu.tools.metric_weights inception pt_inception.pth out.npz
    python -m hpvaegan_tpu.tools.metric_weights c3d c3d.pickle out.npz

`inception` expects a torchvision-style InceptionV3 state_dict (the
pytorch-fid FID-weights file works: modules named Conv2d_1a_3x3..Mixed_7c
with .conv.weight / .bn.{weight,bias,running_mean,running_var}); `c3d`
expects the standard C3D-pytorch Sports-1M state_dict (conv1..conv4b).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, np.float32)


def inception_state_dict_to_npz(sd: Dict, out_path: str) -> int:
    """torchvision InceptionV3 names -> metrics/inception.py names.
    <module>.conv.weight (OIHW) -> <module>.w (HWIO); .bn.* -> .bn_*."""
    out: Dict[str, np.ndarray] = {}
    for key, value in sd.items():
        if key.endswith(".conv.weight"):
            mod = key[:-len(".conv.weight")]
            out[f"{mod}.w"] = _np(value).transpose(2, 3, 1, 0)
        elif key.endswith(".bn.weight"):
            out[key[:-len(".bn.weight")] + ".bn_gamma"] = _np(value)
        elif key.endswith(".bn.bias"):
            out[key[:-len(".bn.bias")] + ".bn_beta"] = _np(value)
        elif key.endswith(".bn.running_mean"):
            out[key[:-len(".bn.running_mean")] + ".bn_mean"] = _np(value)
        elif key.endswith(".bn.running_var"):
            out[key[:-len(".bn.running_var")] + ".bn_var"] = _np(value)
    np.savez(out_path, **out)
    return len(out)


def c3d_state_dict_to_npz(sd: Dict, out_path: str) -> int:
    """C3D-pytorch names (conv1..conv4b, OIDHW) -> metrics/c3d.py names
    (conv1a..conv4b, DHWIO)."""
    rename = {"conv1": "conv1a", "conv2": "conv2a"}
    out: Dict[str, np.ndarray] = {}
    for key, value in sd.items():
        if not key.startswith("conv"):
            continue
        name, kind = key.split(".", 1)
        name = rename.get(name, name)
        if kind == "weight":
            out[f"{name}.w"] = _np(value).transpose(2, 3, 4, 1, 0)
        elif kind == "bias":
            out[f"{name}.b"] = _np(value)
    np.savez(out_path, **out)
    return len(out)


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["inception", "c3d"])
    p.add_argument("src", help="torch checkpoint (.pth/.pickle)")
    p.add_argument("out", help="output .npz")
    args = p.parse_args()

    import torch

    sd = torch.load(args.src, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    fn = inception_state_dict_to_npz if args.kind == "inception" \
        else c3d_state_dict_to_npz
    n = fn(sd, args.out)
    print(f"wrote {n} arrays to {args.out}")


if __name__ == "__main__":
    main()
