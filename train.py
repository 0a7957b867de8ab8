#!/usr/bin/env python
"""Train an NLBAC agent: `python train.py --preset unicycle ...`."""
from nlbac_tpu.train.cli import main

if __name__ == "__main__":
    main()
