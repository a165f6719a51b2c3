"""Angle-pairing trainer CLI (ref angle_pairing.py).

The reference script is import-broken in the snapshot (it imports
get_cars/get_chairs/get_faces_3d which dataset.py never defines —
SURVEY.md C8); the resolvers are restored in data/resolvers.py and this
trainer works. Its loss-graph variants are honored: the FM loss skips the
first discriminator feature (ref :114-115) and the log line has no FM
field (ref :350-354). Its get_gan_loss copy lacks the (B,1,1,1)->(B,1)
reshape and would crash against the discriminator's 4D output — the
reshaping variant is used everywhere (SURVEY.md appendix).
"""

from __future__ import annotations

from .common import parse_with_config, angle_parser
from ..train.loop import run_training


def main(argv=None):
    args = parse_with_config(angle_parser(), argv)
    return run_training(args, angle_variant=True, distributed=False)


if __name__ == "__main__":
    main()
