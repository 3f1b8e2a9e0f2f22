"""Training layer: jitted multi-pass train step, optimizers, checkpointing.

Replaces /root/reference/train.py's host-side epoch loop + per-frame Python
iteration (+ per-frame cuda syncs, train.py:235) with ONE jitted step that
runs the reference's three gradient passes (joint, LSTM-only, GP-only —
train.py:200-248, 175-198, 146-172) as fully batched XLA programs.
"""

from dvg_tpu.train.optim import make_optimizers, gp_lr_schedule
from dvg_tpu.train.step import TrainState, make_train_step, init_train_state
from dvg_tpu.train.checkpoint import (save_checkpoint, load_checkpoint,
                                      load_checkpoint_blob,
                                      read_checkpoint_bytes_synced,
                                      restore_state)

__all__ = [
    "make_optimizers", "gp_lr_schedule",
    "TrainState", "make_train_step", "init_train_state",
    "save_checkpoint", "load_checkpoint", "load_checkpoint_blob",
    "read_checkpoint_bytes_synced", "restore_state",
]
