#!/usr/bin/env python3
"""Multi-scale single-image training CLI (reference: train_image.py).

Flag surface matches the reference argparse (train_image.py:215-274); the
training itself is the TPU-native pipeline in hpvaegan_tpu.training.trainer.

Example (the minimum end-to-end slice, BASELINE config 1):
  python train_image.py --image-path data/imgs/air_balloons.jpg \
      --checkname quick --nfc 32 --niter 50 --min-size 32 --img-size 64
"""

import argparse
import logging
import os
import random

from hpvaegan_tpu.config import Config
from hpvaegan_tpu.training.trainer import run_training
from hpvaegan_tpu.utils import logger as hlog
from hpvaegan_tpu.utils.saver import DataSaver


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument('--device-id', default=0, type=int, help='Device ID')

    # Load, input, save configurations
    parser.add_argument('--netG', default='', help='path to netG (to continue training)')
    parser.add_argument('--netD', default='', help='path to netD (to continue training)')
    parser.add_argument('--intermediate', default='', help='path to intermediate file')
    parser.add_argument('--manualSeed', type=int, help='manual seed')

    # Networks hyper parameters
    parser.add_argument('--nc-im', type=int, default=3, help='# channels')
    parser.add_argument('--nfc', type=int, default=64, help='model basic # channels')
    parser.add_argument('--latent-dim', type=int, default=128, help='Latent dim size')
    parser.add_argument('--vae-levels', type=int, default=3, help='# VAE levels')
    parser.add_argument('--enc-blocks', type=int, default=2, help='# encoder blocks')
    parser.add_argument('--ker-size', type=int, default=3, help='kernel size')
    parser.add_argument('--num-layer', type=int, default=5, help='number of layers')
    parser.add_argument('--stride', default=1, help='stride')
    parser.add_argument('--padd-size', type=int, default=1, help='net pad size')
    parser.add_argument('--generator', type=str, default='GeneratorHPVAEGAN', help='generator model')
    parser.add_argument('--discriminator', type=str, default='WDiscriminator2D', help='discriminator model')

    # Pyramid parameters
    parser.add_argument('--scale-factor', type=float, default=0.75, help='pyramid scale factor')
    parser.add_argument('--noise_amp', type=float, default=0.1, help='addative noise cont weight')
    parser.add_argument('--min-size', type=int, default=32, help='image minimal size at the coarser scale')
    parser.add_argument('--max-size', type=int, default=256, help='image maximal size at the finest scale')

    # Optimization hyper parameters
    parser.add_argument('--niter', type=int, default=5000, help='number of iterations to train per scale')
    parser.add_argument('--lr-g', type=float, default=0.0005, help='G learning rate')
    parser.add_argument('--lr-d', type=float, default=0.0005, help='D learning rate')
    parser.add_argument('--beta1', type=float, default=0.5, help='beta1 for adam')
    parser.add_argument('--lambda-grad', type=float, default=0.1, help='gradient penalty weight')
    parser.add_argument('--rec-weight', type=float, default=10., help='reconstruction loss weight')
    parser.add_argument('--kl-weight', type=float, default=1., help='KL loss weight')
    parser.add_argument('--disc-loss-weight', type=float, default=1.0, help='discriminator weight')
    parser.add_argument('--lr-scale', type=float, default=0.2, help='scaling of learning rate for lower stages')
    parser.add_argument('--train-depth', type=int, default=1, help='how many layers are trained if growing')
    parser.add_argument('--grad-clip', type=float, default=5, help='gradient clip')
    parser.add_argument('--const-amp', action='store_true', default=False, help='constant noise amplitude')
    parser.add_argument('--train-all', action='store_true', default=False, help='train all levels w.r.t. train-depth')

    # Dataset
    parser.add_argument('--image-path', required=True, help='image path')
    parser.add_argument('--hflip', action='store_true', default=False, help='horizontal flip')
    parser.add_argument('--img-size', type=int, default=256)
    parser.add_argument('--stop-scale-time', type=int, default=-1)
    parser.add_argument('--data-rep', type=int, default=1000, help='data repetition')

    # Main arguments
    parser.add_argument('--checkname', type=str, default='debug', help='check name')
    parser.add_argument('--mode', default='train', help='task to be done')
    parser.add_argument('--print-interval', type=int, default=10, help='print interval')
    parser.add_argument('--image-interval', type=int, default=100, help='image interval')
    parser.add_argument('--batch-size', type=int, default=1, help='batch size')
    parser.add_argument('--visualize', action='store_true', default=False, help='visualize the image')

    # TPU-native additions
    parser.add_argument('--compute-dtype', type=str, default='float32',
                        choices=['float32', 'bfloat16'])
    parser.add_argument('--steps-per-call', type=int, default=8,
                        help='training iterations fused per XLA dispatch')
    parser.add_argument('--profile-dir', type=str, default='',
                        help='capture a jax.profiler trace of the run into this dir')
    parser.add_argument('--mesh-data', type=int, default=1,
                        help='data-parallel devices (batch sharded over the mesh)')
    parser.add_argument('--mesh-sp', type=int, default=1,
                        help='spatial mesh axis (H sharded when divisible; '
                             'XLA SPMD inserts the conv halo exchanges)')
    from hpvaegan_tpu.parallel import multihost
    multihost.add_dist_flags(parser)
    parser.add_argument('--paired-g', action='store_true', default=False,
                        help='GAN-phase G step: recon+fake as one width-2B '
                             'forward with per-half BN stats (exact; '
                             'measured neutral on v5e at batch 1)')
    parser.add_argument('--scan-unroll', type=int, default=1,
                        help='unroll factor of the fused iteration scan')
    parser.add_argument('--compile-ahead', action=argparse.BooleanOptionalAction,
                        default=True,
                        help='overlap each scale\'s training with the next '
                             'scale\'s XLA compile (2.7x full-run wall clock, '
                             'behavior-identical; --no-compile-ahead disables)')
    parser.add_argument('--split-step', action='store_true', default=False,
                        help='compile D and G updates as separate programs '
                             'from the start instead of one combined chunk '
                             '(the retry fallback does this automatically '
                             'when the combined chunk exceeds the compiler '
                             'at the largest 3D scales — this flag skips '
                             'the doomed compile attempt on repeat runs)')
    parser.add_argument('--xla-option', dest='xla_options', action='append',
                        default=None, metavar='KEY=VALUE',
                        help='extra XLA compiler option for the train chunk '
                             '(repeatable), e.g. '
                             '--xla-option xla_tpu_scoped_vmem_limit_kib=131072')
    parser.add_argument('--flat-opt', action='store_true', default=False,
                        help='single-buffer fused clip+Adam (numerically '
                             'identical; measured ~5%% slower on v5e — kept '
                             'as an A/B lever, see docs/PERF.md)')
    parser.add_argument('--fused-dg', action='store_true', default=False,
                        help='share one fake forward between D and G losses (~10%% faster; '
                             'deviates from per-step fresh fake noise)')
    parser.add_argument('--ckpt-interval', type=int, default=0,
                        help='mid-scale checkpoint cadence in iterations '
                             '(0 = scale-end only). Saves the full train '
                             'state (G+D, optimizers, RNG) so a supervisor '
                             'restart resumes bit-exactly mid-scale instead '
                             'of losing the whole scale')
    parser.add_argument('--bug-compat', action='store_true', default=False,
                        help='replicate reference bugs (frozen GP alpha, severed '
                             'adv G grad, noise amp /batch_size)')
    parser.add_argument('--run-dir', type=str, default='run', help='experiment root dir')
    return parser


def cfg_from_args(args: argparse.Namespace) -> Config:
    cfg = Config()
    for k, v in vars(args).items():
        if k == "xla_options" and isinstance(v, list):
            bad = [s for s in v if "=" not in s]
            if bad:
                raise SystemExit(
                    f"--xla-option expects KEY=VALUE, got: {', '.join(bad)}")
            v = dict(s.split("=", 1) for s in v)
        if hasattr(cfg, k):
            setattr(cfg, k, v)
    return cfg


def main():
    args = build_parser().parse_args()
    cfg = cfg_from_args(args).finalize()

    from hpvaegan_tpu.parallel import multihost
    multihost.init_from_cfg(cfg)

    if cfg.manualSeed is None:
        cfg.manualSeed = random.randint(1, 10000)
    cfg.manualSeed = multihost.agree_seed(cfg.manualSeed)
    random.seed(cfg.manualSeed)

    if multihost.is_primary():
        cfg.saver = DataSaver(cfg)
        hlog.configure_logging(os.path.abspath(
            os.path.join(cfg.saver.experiment_dir, 'logbook.txt')))
        logging.info('Random Seed: %s', cfg.manualSeed)

        cfg.write_args_txt(os.path.join(cfg.saver.experiment_dir, 'args.txt'))
        with hlog.LoggingBlock('Experiment Summary', emph=True):
            logging.info('Experiment dir: %s', cfg.saver.experiment_dir)
            logging.info('Generator      : %s', cfg.generator)
            logging.info('Iterations     : %s', cfg.niter)
            logging.info('Rec. Weight    : %s', cfg.rec_weight)
            logging.info('Scales         : %s', cfg.stop_scale + 1)

    from hpvaegan_tpu.utils.profiling import trace
    with trace(getattr(args, 'profile_dir', '')):
        run_training(cfg, mode='image', seed=cfg.manualSeed)


if __name__ == '__main__':
    main()
