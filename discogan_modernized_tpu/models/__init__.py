from .generator import generator_init, generator_apply
from .discriminator import discriminator_init, discriminator_apply
from .geometry import encoder_channels, num_features

__all__ = [
    "generator_init",
    "generator_apply",
    "discriminator_init",
    "discriminator_apply",
    "encoder_channels",
    "num_features",
]
