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
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
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
                          sample_axis: str = "sample"):
    """Sample-parallel diverse eval: wrap a per-device
    (params, stats, cache, x, key) -> {"ssim","psnr","mse": (S_local, T, B)}
    metrics rollout in a shard_map over `sample_axis`. Each device generates
    its own slice of futures (key folded by its mesh position — ZERO
    cross-chip traffic during the scan); outputs concatenate over samples.
    Build `metrics_fn` with nsample = S_total / mesh.shape[sample_axis]."""
    from jax.experimental.shard_map import shard_map

    def local(params, stats, cache, x, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(sample_axis))
        return metrics_fn(params, stats, cache, x, key)

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=jax.tree_util.tree_map(lambda _: P(sample_axis),
                                         {"ssim": 0, "psnr": 0, "mse": 0}),
        check_rep=False)
    return jax.jit(sharded)
