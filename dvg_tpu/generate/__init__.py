"""Generation layer: batched diverse-future rollout engine + eval.

Replaces /root/reference/generate_frames.py's serial Python loops (100
samples x 104 frames with per-frame device→host copies) with single jitted
scans: all samples roll out as one vmapped scan, metrics compute on device,
and only final arrays cross to host.
"""

from dvg_tpu.generate.rollout import (RolloutFns, make_rollout_fns,
                                      best_of_n)

__all__ = ["RolloutFns", "make_rollout_fns", "best_of_n"]
