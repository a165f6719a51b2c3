"""Single-process trainer CLI (ref image_translation.py)."""

from __future__ import annotations

from .common import translation_parser
from ..train.loop import run_training


def main(argv=None):
    args = translation_parser().parse_args(argv)
    return run_training(args, angle_variant=False, distributed=False)


if __name__ == "__main__":
    main()
