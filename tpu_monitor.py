#!/usr/bin/env python
"""Device monitor / job manager (TPU-native equivalent of gpu_monitor.py)."""
from discogan_modernized_tpu.tools.monitor import main

if __name__ == "__main__":
    main()
