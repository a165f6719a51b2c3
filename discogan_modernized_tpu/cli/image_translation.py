"""Single-process trainer CLI (ref image_translation.py)."""

from __future__ import annotations

from .common import parse_with_config, translation_parser
from ..train.loop import run_training


def main(argv=None):
    args = parse_with_config(translation_parser(), argv)
    return run_training(args, angle_variant=False, distributed=False)


if __name__ == "__main__":
    main()
