"""Model registry: name -> (init, apply) pairs, replacing the reference's
reflective getattr(networks_2d, opt.generator) lookup (train_image.py:358-359).
"""

from . import networks_2d, networks_3d
from .networks_2d import generator_init_next_stage

GENERATORS_2D = {
    "GeneratorHPVAEGAN": (networks_2d.generator_hpvaegan_init,
                          networks_2d.generator_hpvaegan_apply),
    "GeneratorVAE_nb": (networks_2d.generator_vae_nb_init,
                        networks_2d.generator_vae_nb_apply),
}

DISCRIMINATORS_2D = {
    "WDiscriminator2D": (networks_2d.wdiscriminator2d_init,
                         networks_2d.wdiscriminator2d_apply),
}

GENERATORS_3D = {
    "GeneratorHPVAEGAN": (networks_3d.generator_hpvaegan_init,
                          networks_3d.generator_hpvaegan_apply),
    "GeneratorVAE_nb": (networks_3d.generator_vae_nb_init,
                        networks_3d.generator_vae_nb_apply),
    "GeneratorCSG": (networks_3d.generator_csg_init,
                     networks_3d.generator_csg_apply),
    "GeneratorSG": (networks_3d.generator_sg_init,
                    networks_3d.generator_sg_apply),
}

DISCRIMINATORS_3D = {
    "WDiscriminator3D": (networks_3d.wdiscriminator3d_init,
                         networks_3d.wdiscriminator3d_apply),
    "WDiscriminatorBaselines": (networks_3d.wdiscriminator_baselines_init,
                                networks_3d.wdiscriminator_baselines_apply),
}


GENERATOR_PAIRS = {
    # width-2B recon+fake forward (per-half BN): steps._g_step_core fast path
    (2, "GeneratorHPVAEGAN"): networks_2d.generator_hpvaegan_apply_pair,
}


def get_generator(name: str, ndim: int = 2):
    table = GENERATORS_2D if ndim == 2 else GENERATORS_3D
    assert name in table, f"unknown generator {name} (have {list(table)})"
    return table[name]


def get_generator_pair(name: str, ndim: int = 2):
    """Paired recon+fake apply, or None when the model has no fused variant."""
    return GENERATOR_PAIRS.get((ndim, name))


def get_discriminator(name: str, ndim: int = 2):
    table = DISCRIMINATORS_2D if ndim == 2 else DISCRIMINATORS_3D
    assert name in table, f"unknown discriminator {name} (have {list(table)})"
    return table[name]
