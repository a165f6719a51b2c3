from .optim import adam_init, adam_update
from .graph import discogan_losses, mix_losses, ARCH_MODES
from .step import TrainConfig, init_train_state, make_train_steps

__all__ = [
    "adam_init",
    "adam_update",
    "discogan_losses",
    "mix_losses",
    "ARCH_MODES",
    "TrainConfig",
    "init_train_state",
    "make_train_steps",
]
