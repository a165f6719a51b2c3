from .conv import conv2d, conv_transpose2d, conv_init, conv_transpose_init
from .batchnorm import (
    BN_EPS,
    BN_MOMENTUM,
    batchnorm_init,
    batchnorm_apply,
)
from .activations import leaky_relu, relu, sigmoid
from .losses import (
    bce_loss,
    mse_loss,
    feature_matching_loss,
    gan_losses,
)

__all__ = [
    "conv2d",
    "conv_transpose2d",
    "conv_init",
    "conv_transpose_init",
    "BN_EPS",
    "BN_MOMENTUM",
    "batchnorm_init",
    "batchnorm_apply",
    "leaky_relu",
    "relu",
    "sigmoid",
    "bce_loss",
    "mse_loss",
    "feature_matching_loss",
    "gan_losses",
]
