from .dp import (
    make_dp_train_steps,
    replicate_train_state,
    unreplicate_train_state,
    shard_batch,
)

__all__ = [
    "make_dp_train_steps",
    "replicate_train_state",
    "unreplicate_train_state",
    "shard_batch",
]
