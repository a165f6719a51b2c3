#!/usr/bin/env python
"""Entry point: same name/flags as the reference's hyperparameter_search.py."""
from discogan_modernized_tpu.tools.hyperparameter_search import main

if __name__ == "__main__":
    main()
