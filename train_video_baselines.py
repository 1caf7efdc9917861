#!/usr/bin/env python3
"""SinGAN-style video baselines CLI (reference: train_video_baselines.py).

Trains GeneratorCSG / GeneratorSG: pure GAN at every scale with a fixed
Z_init reconstruction noise (no VAE phase). The reference driver crashes as
shipped (PyTorch leftover at :340); this is the working TPU-native version."""

import logging
import os
import random

from hpvaegan_tpu.config import Config
from hpvaegan_tpu.training.baselines_trainer import run_training
from hpvaegan_tpu.utils import logger as hlog
from hpvaegan_tpu.utils.saver import DataSaver

from train_video import build_parser, cfg_from_args


def main():
    parser = build_parser()
    parser.set_defaults(generator='GeneratorCSG',
                        discriminator='WDiscriminatorBaselines')
    args = parser.parse_args()
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

    run_training(cfg, seed=cfg.manualSeed)


if __name__ == '__main__':
    main()
