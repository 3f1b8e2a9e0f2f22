#!/usr/bin/env python
"""`python train.py --dataset ... --image_width ...` — same CLI surface as
the reference trainer (/root/reference/train.py). Thin wrapper over
dvg_tpu.cli.train."""
import sys

from dvg_tpu.cli.train import main

if __name__ == "__main__":
    sys.exit(main())
