"""Structured metric logging: JSONL + console.

The reference logs with bare prints (train.py:368, 391) and throws away the
SSIM/PSNR arrays it computes (generate_frames.py:329). Here every metric is
persisted: one JSON object per line in <log_dir>/metrics.jsonl, and eval
arrays are saved as .npz (SURVEY.md §5.5)."""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import numpy as np


def _is_writer() -> bool:
    """Only one process may append to the shared metrics file / .npz dir in
    a multi-host run; non-coordinators still echo to their own stdout.
    Delegates to the single source of truth for write ownership
    (parallel.is_coordinator); lazily, so importing utils never drags jax
    in, and defensively for jax-free contexts."""
    try:
        from dvg_tpu.parallel import is_coordinator
        return is_coordinator()
    except Exception:
        return True


class MetricLogger:
    def __init__(self, log_dir: str, filename: str = "metrics.jsonl",
                 echo: bool = True):
        self.log_dir = log_dir
        self.writer = _is_writer()
        if self.writer:
            os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, filename)
        self.echo = echo
        self._t0 = time.time()

    _RESERVED = ("kind", "step", "wall_s")

    def log(self, step: int, metrics: Dict, kind: str = "train") -> None:
        rec = {"kind": kind, "step": int(step),
               "wall_s": round(time.time() - self._t0, 3)}
        keys = []
        for k, v in metrics.items():
            # a metric named like a bookkeeping field must not corrupt the
            # record's step/kind/wall_s columns
            key = k if k not in self._RESERVED else k + "_metric"
            keys.append(key)
            try:
                rec[key] = float(v)
            except (TypeError, ValueError):
                # small arrays → lists; big ones → a summary (an unbounded
                # tolist() of an accidental device array would sync the
                # pipeline and write MB-scale JSON lines from the hot
                # loop); never let a non-serializable value abort training
                try:
                    a = np.asarray(v)
                    rec[key] = (a.tolist() if a.size <= 64 else
                                f"<array shape={a.shape} dtype={a.dtype}>")
                except Exception:
                    rec[key] = str(v)
        if self.writer:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec, default=str) + "\n")
        if self.echo:
            body = " ".join(f"{k}={rec[k]:.5g}" if isinstance(rec[k], float)
                            else f"{k}={rec[k]}" for k in keys)
            print(f"[{kind} {step}] {body}", flush=True)

    def save_arrays(self, name: str, **arrays) -> str:
        """Persist eval arrays (e.g. the (B, S, T) SSIM/PSNR grids the
        reference discards)."""
        path = os.path.join(self.log_dir, f"{name}.npz")
        if self.writer:
            np.savez_compressed(path, **{k: np.asarray(v)
                                         for k, v in arrays.items()})
        return path
