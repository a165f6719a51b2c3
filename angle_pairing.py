#!/usr/bin/env python
"""Entry point: same name/flags as the reference's angle_pairing.py."""
from discogan_modernized_tpu.cli.angle_pairing import main

if __name__ == "__main__":
    main()
