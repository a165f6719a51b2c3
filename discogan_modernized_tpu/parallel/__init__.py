from .dp import (
    make_dp_train_steps,
    make_dp_lean_dis_step,
    make_dp_scan_train_step,
    replicate_train_state,
    unreplicate_train_state,
    shard_batch,
)
from .gspmd import (
    make_gspmd_train_steps,
    make_gspmd_lean_dis_step,
    place_train_state,
    train_state_shardings,
)

__all__ = [
    "make_dp_train_steps",
    "make_dp_lean_dis_step",
    "make_dp_scan_train_step",
    "replicate_train_state",
    "unreplicate_train_state",
    "shard_batch",
    "make_gspmd_train_steps",
    "make_gspmd_lean_dis_step",
    "place_train_state",
    "train_state_shardings",
]
