"""Checkpointing: full-train-state msgpack pytree checkpoints + config.

Reference contract (/root/reference/train.py:380-388,
generate_frames.py:43-72):
  * saved every 4 epochs to a single rotating file in `log_dir`;
  * generation loads the checkpoint, REPLACES its live config with the
    saved one, then overrides n_eval=105, n_future=100, batch_size=50
    (the §3.5 restore-then-override contract → DVGConfig.generation_override);
  * the reference cannot resume training (no encoder/decoder optimizer
    state is saved, and train.py never loads); here the FULL TrainState
    (params + BN stats + all four optimizer states + step counter) is
    checkpointed, so training resume is exact.

Format: one msgpack blob via flax.serialization holding
{config_json, params, stats, opt_states, step}. Pure host-side bytes — no
pickled code objects (the reference pickles whole nn.Modules), so
checkpoints are portable across framework versions.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import numpy as np
from flax import serialization

from dvg_tpu.config import DVGConfig

CKPT_NAME = "model.ckpt"


def _to_host(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


def save_checkpoint(path: str, cfg: DVGConfig, state) -> str:
    """state: TrainState (or any pytree with params/stats/opt_states/step).

    `path` may be a directory (writes <path>/model.ckpt inside it) or an
    explicit FILE path — only a basename with a KNOWN checkpoint
    extension (.ckpt/.msgpack) selects the file branch, so
    save_checkpoint('out/final.msgpack', ...) writes that file while a
    dotted run name like 'runs/v1.5' still creates a directory (an
    any-dot heuristic would reclassify such names and strand downstream
    <dir>/model.ckpt readers). An existing dir or trailing separator
    always selects the directory branch."""
    is_file = (not path.endswith(os.sep)
               and not os.path.isdir(path)
               and os.path.splitext(path)[1] in (".ckpt", ".msgpack"))
    if not is_file:
        os.makedirs(path, exist_ok=True)
        path = os.path.join(path, CKPT_NAME)
    else:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "config": json.dumps(cfg.to_dict()),
        # to_state_dict normalizes NamedTuples (optax states) and lists into
        # msgpack-serializable nested dicts; from_state_dict reverses it
        "params": serialization.to_state_dict(_to_host(state.params)),
        "stats": serialization.to_state_dict(_to_host(state.stats)),
        "opt_states": serialization.to_state_dict(_to_host(state.opt_states)),
        "step": np.asarray(state.step),
    }
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)  # atomic rotate (reference overwrites model.pth)
    return path


def load_checkpoint(path: str, target_state=None
                    ) -> Tuple[DVGConfig, Optional[object]]:
    """Returns (saved config, restored state).

    If `target_state` (a freshly-initialized TrainState built from the saved
    config) is given, its structure receives the saved leaves — including
    optimizer states, enabling exact train resume. If omitted, returns the
    raw dict payload in its place (params/stats reachable by key)."""
    if os.path.isdir(path):
        path = os.path.join(path, CKPT_NAME)
    with open(path, "rb") as f:
        return load_checkpoint_blob(f.read(), target_state)


def load_checkpoint_blob(blob: bytes, target_state=None
                         ) -> Tuple[DVGConfig, Optional[object]]:
    """`load_checkpoint` from in-memory bytes. Multi-host callers broadcast
    the coordinator's file and decode locally so every process holds the
    SAME checkpoint even when per-host disks have stale or missing copies
    (cli/generate.py)."""
    payload = serialization.msgpack_restore(blob)
    cfg = DVGConfig.from_dict(json.loads(payload["config"]))
    if target_state is None:
        return cfg, payload
    return cfg, restore_state(target_state, payload)


def read_checkpoint_bytes_synced(path: str) -> bytes:
    """Checkpoint bytes, identical on every process.

    Checkpoints are written coordinator-only (cli/train.py), so on
    per-host local disks a peer may hold a missing or STALE model.ckpt;
    loading it independently would assemble a 'replicated' global array
    whose shards differ across hosts — silently wrong results. The
    coordinator reads the file and broadcasts the raw bytes (a uint32
    [err_flag, size_hi, size_lo] header first, then the blob) for every
    process to decode (load_checkpoint_blob). A coordinator-side read
    failure sets the header's err flag so the peers raise instead of
    hanging in the collective forever.

    (cli/train.py's --resume uses a different mechanism on purpose: it
    must handle the no-checkpoint-anywhere case by broadcasting the
    seed-init STATE, not a file.)"""
    import jax
    if os.path.isdir(path):
        path = os.path.join(path, CKPT_NAME)
    if jax.process_count() <= 1:
        with open(path, "rb") as f:
            return f.read()
    from jax.experimental import multihost_utils as mhu
    err = None
    blob = np.zeros((0,), np.uint8)
    if jax.process_index() == 0:
        try:
            with open(path, "rb") as f:
                blob = np.frombuffer(f.read(), np.uint8)
        except OSError as e:
            err = e
    # The header travels as uint32 [err_flag, size_hi, size_lo]: a bare
    # int64 scalar is silently truncated to int32 by jax when
    # jax_enable_x64 is off (the default), which would corrupt the size
    # for checkpoints >= 2 GiB — wrapped n means a bogus error on every
    # peer or a wrong-sized buffer entering the collective.
    size = 0 if err is not None else int(blob.size)
    hdr = np.asarray(mhu.broadcast_one_to_all(np.array(
        [1 if err is not None else 0, size >> 32, size & 0xFFFFFFFF],
        np.uint32)))
    if int(hdr[0]):
        raise err if err is not None else FileNotFoundError(
            f"coordinator failed to read checkpoint {path!r}")
    n = (int(hdr[1]) << 32) | int(hdr[2])
    if blob.size != n:
        blob = np.zeros((n,), np.uint8)
    return np.asarray(mhu.broadcast_one_to_all(blob)).tobytes()


def restore_state(target_state, payload):
    """Restore a TrainState structure from an ALREADY-LOADED payload dict —
    for callers that need the saved config first to build the skeleton
    (one disk read + msgpack decode instead of two)."""
    return type(target_state)(
        params=serialization.from_state_dict(target_state.params,
                                             payload["params"]),
        stats=serialization.from_state_dict(target_state.stats,
                                            payload["stats"]),
        opt_states=serialization.from_state_dict(target_state.opt_states,
                                                 payload["opt_states"]),
        step=jax.numpy.asarray(payload["step"]),
    )
