"""Mesh + sharding helpers for multi-chip training and generation.

Strategy (the scaling-book recipe: pick a mesh, annotate shardings, let XLA
insert collectives):

  * **training** — a 1-D `('data',)` mesh; the time-major batch
    (T, B, H, W, C) shards over B, parameters/optimizer states replicate.
    Under jit, XLA turns the replicated-param + sharded-batch gradient
    computation into per-chip grads + one psum over ICI — data parallelism
    without a single explicit collective in user code. BatchNorm batch
    statistics are computed over the GLOBAL batch: the mean/var reductions
    inside the vmapped conv blocks become cross-chip psums automatically
    (torch DataParallel would have used per-replica stats; the reference
    has neither).
  * **generation** — a `('sample', 'data')` mesh: the S=100 diversity
    samples shard over 'sample', the eval batch over 'data'. Each chip
    rolls out its slice of futures independently (zero communication in the
    scan), and the best-of-N SSIM reduction all-gathers only (B, S, T)
    scalars at the end.

The same code paths run on the 8-device virtual CPU mesh in tests
(XLA_FLAGS=--xla_force_host_platform_device_count=8) and on real ICI.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Sequence[Tuple[str, int]] = None,
              devices=None) -> Mesh:
    """Build a mesh from (name, size) pairs; a size of -1 absorbs the
    remaining devices. Default: 1-D ('data', all devices)."""
    devices = list(devices if devices is not None else jax.devices())
    if not axis_sizes:
        axis_sizes = [("data", len(devices))]
    names = [n for n, _ in axis_sizes]
    sizes = [s for _, s in axis_sizes]
    if sizes.count(-1) > 1:
        raise ValueError(f"mesh {list(zip(names, sizes))}: at most one "
                         "axis size may be -1")
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        if len(devices) % known:
            raise ValueError(
                f"mesh {list(zip(names, sizes))}: -1 cannot absorb the "
                f"rest — {len(devices)} devices do not divide by the "
                f"fixed axes' product {known} (devices would sit idle "
                "silently)")
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(f"mesh {list(zip(names, sizes))} needs {total} "
                         f"devices, have {len(devices)}")
    arr = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(arr, tuple(names))


def shard_batch(mesh: Mesh, batch_axis: str = "data", time_major: bool = True):
    """NamedSharding for a (T, B, ...) (time-major) or (B, ...) batch."""
    spec = P(None, batch_axis) if time_major else P(batch_axis)
    return NamedSharding(mesh, spec)


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_train_step(step_fn, mesh: Mesh, batch_axis: str = "data"):
    """Wrap a (state, x) -> (state, metrics) step for the mesh: state
    replicated, x sharded over the batch axis. XLA inserts the gradient
    psum; outputs stay replicated."""
    rep = replicate(mesh)
    xs = shard_batch(mesh, batch_axis)
    return jax.jit(step_fn, in_shardings=(rep, xs),
                   out_shardings=(rep, rep), donate_argnums=(0,))


def shard_diverse_rollout(metrics_fn, mesh: Mesh,
                          sample_axis: str = "sample",
                          data_axis: str = None,
                          full_cov: bool = False):
    """Sample-parallel diverse eval: wrap a per-device
    (params, stats, cache, x, key) -> {"ssim","psnr","mse": (S_local, T, B)}
    metrics rollout in a shard_map over `sample_axis`. Each device generates
    its own slice of futures (key folded by its mesh position — ZERO
    cross-chip traffic during the scan); outputs concatenate over samples.
    Build `metrics_fn` with nsample = S_total / mesh.shape[sample_axis].

    With `data_axis` (a 2-D ('sample','data') mesh) the (T, B, ...) eval
    batch additionally shards its rows over 'data'; each device rolls out
    S_local futures of B_local rows. The shard's global row start is passed
    as the rollout's `row_offset` so per-row noise stays a function of the
    GLOBAL row id — `diverse_select` re-rolls any scored future from
    (sample-device, global row) alone, independent of the data layout.

    Pass `full_cov=cfg.full_cov_sampling`: the batch-correlated GP draw
    (generate_frames.py:170) is defined over the WHOLE eval batch, so
    sharding rows over `data_axis` would silently correlate only within
    each shard — the guard lives here, at the mechanism that creates the
    hazard, so every caller (CLI, serving export, library use) is covered."""
    from jax import shard_map

    if full_cov and data_axis is not None and mesh.shape[data_axis] > 1:
        raise ValueError(
            "full_cov_sampling correlates the GP draw across the WHOLE "
            "eval batch (generate_frames.py:170); sharding batch rows over "
            f"'{data_axis}' would silently correlate only within each "
            "shard — use a pure sample-parallel mesh or disable full_cov")

    def local(params, stats, cache, x, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(sample_axis))
        if data_axis is not None:
            offset = jax.lax.axis_index(data_axis) * x.shape[1]
            return metrics_fn(params, stats, cache, x, key, offset)
        return metrics_fn(params, stats, cache, x, key)

    x_spec = P(None, data_axis) if data_axis else P()
    out_elem = (P(sample_axis, None, data_axis) if data_axis
                else P(sample_axis))
    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), x_spec, P()),
        out_specs=jax.tree_util.tree_map(lambda _: out_elem,
                                         {"ssim": 0, "psnr": 0, "mse": 0}),
        check_vma=False)
    return jax.jit(sharded)


def is_coordinator() -> bool:
    """True on the process that owns the shared write paths (checkpoints,
    metrics.jsonl, plots/GIFs). Single-process runs are always the
    coordinator."""
    return jax.process_index() == 0


def replicate_to_mesh(tree, mesh: Mesh):
    """Replicate a pytree of host/per-device values onto every device of the
    mesh — including non-addressable ones in a multi-process run (every
    process holds the full value, e.g. a deterministic same-seed init, so
    each contributes its local shards)."""
    sharding = NamedSharding(mesh, P())

    def put(a):
        a = np.asarray(a)
        if jax.process_count() == 1:
            return jax.device_put(a, sharding)
        return jax.make_array_from_process_local_data(sharding, a)

    return jax.tree_util.tree_map(put, tree)


_DISTRIBUTED_UP = False


def distributed_init() -> bool:
    """Multi-host (DCN) posture: initialize the JAX distributed runtime so
    `jax.devices()` spans all hosts' chips and the meshes built here lay DP/
    sample axes over ICI within a slice and DCN across slices (SURVEY.md
    §5.8). Called by both CLIs before any backend use.

    Activation is env-driven (single-host runs are a no-op):
      * Cloud TPU multi-host slices: `jax.distributed.initialize()` with no
        args auto-discovers the coordinator from TPU metadata — triggered
        here by DVG_MULTIHOST=1;
      * explicit clusters: set DVG_COORDINATOR=host:port, DVG_NUM_PROCESSES
        and DVG_PROCESS_ID.
    """
    import os

    import jax as _jax

    global _DISTRIBUTED_UP
    if _DISTRIBUTED_UP:           # idempotent: a launcher may init before
        return True               # handing control to the CLI (which also
                                  # calls this)
    coord = os.environ.get("DVG_COORDINATOR")
    if coord:
        _jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["DVG_NUM_PROCESSES"]),
            process_id=int(os.environ["DVG_PROCESS_ID"]))
        _DISTRIBUTED_UP = True
        return True
    if os.environ.get("DVG_MULTIHOST") == "1":
        _jax.distributed.initialize()
        _DISTRIBUTED_UP = True
        return True
    return False
