"""Dataset layer: host-side video pipelines feeding time-major device arrays.

Replaces the reference's torch Dataset + DataLoader stack
(/root/reference/utils.py:27-95, data/*.py) with:

  * map-style datasets (`MovingMNIST`, `BAIR`, `KTH`, `UCF`) returning
    float32 sequences shaped (T, H, W, C) in [0, 1];
  * `load_dataset(cfg)` — the registry switch (reference utils.py:27-81);
  * `Loader` — a threaded host pipeline producing time-major
    (T, B, H, W, C) batches (reference utils.py:86-95 `normalize_data`),
    optionally placed on device with a sharding.
"""

from dvg_tpu.data.moving_mnist import MovingMNIST
from dvg_tpu.data.frames import BAIR, KTH, UCF
from dvg_tpu.data.pipeline import Loader, load_dataset, normalize_batch

__all__ = [
    "MovingMNIST", "BAIR", "KTH", "UCF",
    "Loader", "load_dataset", "normalize_batch",
]
