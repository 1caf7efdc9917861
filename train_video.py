#!/usr/bin/env python3
"""Multi-scale single-video training CLI (reference: train_video.py).

Same structure as train_image.py in 3D: Conv3D VAE encoder/decoder at coarse
scales, WGAN-GP patch-GAN refinement at fine scales, with the fps/time-depth
schedule re-generating the temporal pyramid per scale."""

import argparse
import logging
import os
import random

from hpvaegan_tpu.config import Config
from hpvaegan_tpu.training.trainer import run_training
from hpvaegan_tpu.utils import logger as hlog
from hpvaegan_tpu.utils.saver import DataSaver

from train_image import build_parser as build_image_parser


def build_parser() -> argparse.ArgumentParser:
    parser = build_image_parser()
    # swap the image dataset flags for the video ones
    # (reference train_video.py:276-283)
    for action in list(parser._actions):
        if action.dest in ("image_path",):
            parser._remove_action(action)
            for group in parser._action_groups:
                if action in group._group_actions:
                    group._group_actions.remove(action)
    parser.add_argument('--video-path', required=True, help='video path')
    parser.add_argument('--start-frame', default=0, type=int,
                        help='start frame number')
    parser.add_argument('--max-frames', default=13, type=int,
                        help='# frames to use')
    parser.add_argument('--sampling-rates', type=int, nargs='+',
                        default=[4, 3, 2, 1], help='sampling rates')
    parser.set_defaults(discriminator='WDiscriminator3D', niter=50000,
                        checkname='DEBUG')
    return parser


def cfg_from_args(args: argparse.Namespace) -> Config:
    cfg = Config()
    for k, v in vars(args).items():
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
            logging.info('Start frame    : %s', cfg.start_frame)
            logging.info('Max frames     : %s', cfg.max_frames)
            logging.info('Generator      : %s', cfg.generator)
            logging.info('Iterations     : %s', cfg.niter)
            logging.info('Sampling rates : %s', cfg.sampling_rates)

    from hpvaegan_tpu.utils.profiling import trace
    with trace(getattr(args, 'profile_dir', '')):
        run_training(cfg, mode='video', seed=cfg.manualSeed)


if __name__ == '__main__':
    main()
