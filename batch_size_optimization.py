#!/usr/bin/env python
"""Entry point: same name/flags as the reference's batch_size_optimization.py."""
from discogan_modernized_tpu.tools.batch_size_optimization import main

if __name__ == "__main__":
    main()
