#!/usr/bin/env python
"""Entry point kept under the reference's name; see tpu_monitor.py."""
from discogan_modernized_tpu.tools.monitor import main

if __name__ == "__main__":
    main()
