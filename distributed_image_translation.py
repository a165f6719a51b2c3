#!/usr/bin/env python
"""Entry point: same name/flags as the reference's distributed_image_translation.py."""
from discogan_modernized_tpu.cli.distributed_image_translation import main

if __name__ == "__main__":
    main()
