"""Data-parallel trainer CLI (ref distributed_image_translation.py).

The reference's NCCL plumbing (MASTER_ADDR/PORT rendezvous, process groups,
DDP wrap, DistributedSampler, barriers — ref :26-46, :182-226, :396-404) has
no TPU analog: SPMD over the device mesh replaces all of it. The flag
surface is preserved; --distributed turns on mesh data parallelism,
LOCAL_RANK in the environment forces it for torchrun-style launchers
(ref :617-620). The --load_* weights-only resume flags are honored, plus a
--resume extension restoring the full train state (optimizer + iteration),
which the reference cannot do.
"""

from __future__ import annotations

import os

from .common import parse_with_config, distributed_parser
from ..train.loop import run_training


def main(argv=None):
    args = parse_with_config(distributed_parser(), argv)
    if "LOCAL_RANK" in os.environ:
        args.local_rank = int(os.environ["LOCAL_RANK"])
        args.distributed = True
    return run_training(args, angle_variant=False,
                        distributed=bool(args.distributed))


if __name__ == "__main__":
    main()
