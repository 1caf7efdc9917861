#!/usr/bin/env python3
"""Image evaluation CLI (reference: eval_image.py): reload experiments from
args.txt, batch-generate random samples, dump PNGs, compute SIFID."""

import argparse
import logging
import os

from hpvaegan_tpu.evaluation import (eval_image_experiment, hydrate_config,
                                     iter_experiment_dirs)
from hpvaegan_tpu.utils import logger as hlog


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--device-id', default=0, type=int, help='Device ID')
    parser.add_argument('--exp-dir', type=str, required=True,
                        help='Experiment directory (glob)')
    parser.add_argument('--netG', type=str, default='',
                        help='checkpoint file name (default: netG_<scale>.ckpt)')
    parser.add_argument('--save-path', type=str, default='images',
                        help='New directory for outputs')
    parser.add_argument('--num-samples', type=int, default=10,
                        help='number of samples to generate')
    parser.add_argument('--niter', type=int, default=1, help='number of epochs')
    parser.add_argument('--batch-size', type=int, default=1)
    parser.add_argument('--data-rep', type=int, default=1)
    parser.add_argument('--scale-idx', type=int, default=-1,
                        help='scale to evaluate (-1: last trained)')
    parser.add_argument('--max-samples', type=int, default=4)
    parser.add_argument('--mesh-data', type=int, default=1,
                        help='data-parallel devices (sample batch sharded '
                             'over the mesh)')
    parser.add_argument('--on-device-fid', action='store_true', default=False,
                        help='device-resident sampling + sinFID: only '
                             'per-sample (mu, sigma) stats leave the device '
                             '(BASELINE config 5)')
    from hpvaegan_tpu.parallel import multihost
    multihost.add_dist_flags(parser)
    args = parser.parse_args()

    multihost.init_from_cfg(args)
    hlog.configure_logging()
    from hpvaegan_tpu.parallel.mesh import select_device
    select_device(args.device_id)
    all_dirs = iter_experiment_dirs(args.exp_dir)
    for exp_dir in all_dirs:
        if not os.path.exists(os.path.join(exp_dir, 'args.txt')):
            logging.info('Skipping %s (no args.txt)', exp_dir)
            continue
        overrides = dict(niter=args.niter, data_rep=args.data_rep,
                         batch_size=args.batch_size,
                         num_samples=args.num_samples,
                         max_samples=args.max_samples,
                         save_path=args.save_path, scale_idx=args.scale_idx,
                         mesh_data=args.mesh_data,
                         on_device_fid=args.on_device_fid,
                         netG=(os.path.join(exp_dir, args.netG)
                               if args.netG else ''))
        cfg = hydrate_config(exp_dir, overrides)
        sifid, _ = eval_image_experiment(cfg, exp_dir)
        if multihost.is_primary():
            print(f'SIFID: {sifid}')


if __name__ == '__main__':
    main()
