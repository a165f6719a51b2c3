#!/usr/bin/env python
"""Entry point: same name/flags as the reference's inference.py."""
from discogan_modernized_tpu.cli.inference import main

if __name__ == "__main__":
    import sys

    sys.exit(main())
