#!/usr/bin/env python3
"""Export CLI (reference: export.py): rebuild netG at the saved scale and
serialize the serving function to StableHLO (replacing MindIR/Ascend310 with
StableHLO/PJRT for TPU serving)."""

import argparse
import os

from hpvaegan_tpu.config import Config
from hpvaegan_tpu.export.stablehlo import export_sampler, save_exported
from hpvaegan_tpu.utils.saver import load_pytree
from preprocess import pre_process


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--exp-dir', type=str, required=True,
                        help='Experiment directory')
    parser.add_argument('--device-id', default=0, type=int, help='Device ID')
    parser.add_argument('--format', type=str, default='STABLEHLO',
                        help='kept for reference-CLI parity; always StableHLO')
    parser.add_argument('--netG', type=str, default='',
                        help='checkpoint file (default: netG_<scale>.ckpt)')
    parser.add_argument('--scale-idx', type=int, default=-1,
                        help='current scale idx (=len of body)')
    parser.add_argument('--batch-size', type=int, default=1)
    parser.add_argument('--num-samples', type=int, default=1,
                        help='noise bins to write for the runner (one '
                             'inference per bin, latency averaged)')
    args = parser.parse_args()

    exceptions = ['niter', 'data_rep', 'batch_size', 'netG', 'scale_idx']
    cfg = Config.from_args_txt(os.path.join(args.exp_dir, 'args.txt'),
                               exceptions=exceptions)
    cfg.batch_size = args.batch_size
    cfg.scale_idx = args.scale_idx

    infer_dir = os.path.join(args.exp_dir, 'infer')
    os.makedirs(infer_dir, exist_ok=True)

    # writes noise bins AND resolves cfg.scale_idx from intermediate.json
    pre_process(cfg, args.exp_dir, num_samples=args.num_samples)

    netG = args.netG or f'netG_{cfg.scale_idx}.ckpt'
    path = netG if os.path.isabs(netG) else os.path.join(args.exp_dir, netG)
    if not os.path.isfile(path):
        raise RuntimeError(f"=> no <G> checkpoint found at '{path}'")

    # video experiments (args.txt carries video_path) export the 3D sampler
    ndim = 3 if getattr(cfg, 'video_path', '') else 2

    # same checkpoint surface as eval (reference export.py:56-64 also
    # load-converts): torch .pth, MindSpore .ckpt (content-sniffed — our own
    # pytree checkpoints share the suffix), or this framework's pytree
    if path.endswith('.pth'):
        from hpvaegan_tpu.tools.convert import (load_torch_checkpoint,
                                                p2j_HPVAEGAN)
        params, state = p2j_HPVAEGAN(load_torch_checkpoint(path), ndim=ndim)
        ckpt = {'params': params, 'state': state}
    else:
        from hpvaegan_tpu.tools.ms_ckpt import (is_ms_checkpoint,
                                                load_ms_checkpoint)
        if is_ms_checkpoint(path):
            from hpvaegan_tpu.tools.convert import m2j_HPVAEGAN
            params, state = m2j_HPVAEGAN(load_ms_checkpoint(path), ndim=ndim)
            ckpt = {'params': params, 'state': state}
        else:
            ckpt = load_pytree(path)
    prefix = os.path.join(infer_dir, os.path.basename(path).split('.')[0])
    # portable artifact (.stablehlo): multi-platform, verifiable on CPU hosts
    exported = export_sampler(cfg, ckpt['params'], ckpt['state'], ndim=ndim,
                              batch=cfg.batch_size, platforms=('tpu', 'cpu'))
    save_exported(exported, prefix, write_mlir=False)
    # native-runner artifact (.mlir): single-platform so main() keeps the
    # 3-input contract (multi-platform exports prepend a _platform_index arg)
    exported_tpu = export_sampler(cfg, ckpt['params'], ckpt['state'],
                                  ndim=ndim, batch=cfg.batch_size,
                                  platforms=('tpu',))
    with open(prefix + '.mlir', 'w') as f:
        f.write(exported_tpu.mlir_module())

    # sidecars for the native PJRT runner (native/pjrt_runner)
    from jax._src.lib import xla_client
    with open(os.path.join(infer_dir, 'compile_options.bin'), 'wb') as f:
        f.write(xla_client.CompileOptions().SerializeAsString())
    from hpvaegan_tpu.export.stablehlo import serving_input_specs
    with open(os.path.join(infer_dir, 'io_spec.txt'), 'w') as f:
        for spec in serving_input_specs(cfg, ndim=ndim, batch=cfg.batch_size):
            dt = 's32' if spec.dtype.name.startswith('int') else 'f32'
            dims = ','.join(str(d) for d in spec.shape)
            f.write(f'{dt} {dims}\n'.replace(' \n', '\n'))
    print(f'exported {prefix}.stablehlo and {prefix}.mlir')


if __name__ == '__main__':
    main()
