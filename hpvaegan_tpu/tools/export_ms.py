"""Reverse migration: write a trained generator as a MindSpore .ckpt.

A TPU-trained experiment's netG_<k>.ckpt (pytree) is converted back to the
reference's MindSpore parameter naming (tools/convert.j2m_HPVAEGAN) and
serialized in the Checkpoint protobuf format (tools/ms_ckpt) — loadable by
``mindspore.load_checkpoint`` + the reference's training/eval resume paths
(reference train_image.py:374-377).

Usage:
  python -m hpvaegan_tpu.tools.export_ms <experiment_dir> [--scale K] [-o OUT]
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("exp_dir")
    ap.add_argument("--scale", type=int, default=-1,
                    help="scale index (default: intermediate.json's)")
    ap.add_argument("-o", "--out", default="",
                    help="output path (default: <exp>/netG_<k>.ms.ckpt)")
    args = ap.parse_args()

    from .convert import j2m_HPVAEGAN
    from .ms_ckpt import save_ms_checkpoint
    from ..config import Config
    from ..utils.saver import load_pytree

    cfg = Config.from_args_txt(os.path.join(args.exp_dir, "args.txt"))
    with open(os.path.join(args.exp_dir, "intermediate.json")) as f:
        inter = json.load(f)
    k = args.scale if args.scale >= 0 else int(inter["scale_idx"])
    ndim = 3 if getattr(cfg, "video_path", "") else 2

    ckpt = load_pytree(os.path.join(args.exp_dir, f"netG_{k}.ckpt"))
    ms = j2m_HPVAEGAN(ckpt["params"], ckpt["state"], ndim=ndim)
    out = args.out or os.path.join(args.exp_dir, f"netG_{k}.ms.ckpt")
    save_ms_checkpoint(ms, out)
    print(f"wrote {out} ({len(ms)} parameters, scale {k}, {ndim}D)")


if __name__ == "__main__":
    main()
