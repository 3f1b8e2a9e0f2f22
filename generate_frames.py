#!/usr/bin/env python
"""`python generate_frames.py --model_dir ... [--gp_trigger_flag]` — same
CLI surface as the reference generator (/root/reference/generate_frames.py).
Thin wrapper over dvg_tpu.cli.generate."""
import sys

from dvg_tpu.cli.generate import main

if __name__ == "__main__":
    sys.exit(main())
