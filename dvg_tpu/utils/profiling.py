"""Profiling hooks: per-step timing + jax.profiler traces.

The reference has no profiling at all (SURVEY.md §5.1 — a progressbar is
the only instrumentation). Here:
  * `StepTimer` measures wall time per step with device-sync-correct
    boundaries (block_until_ready on a representative output);
  * `trace_context` wraps a region in a `jax.profiler.trace` dump that can
    be opened in TensorBoard/XProf (set trace_dir to enable, no-op
    otherwise).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class StepTimer:
    """Rolling step timer. Call `stop(out)` with a device array to include
    device completion in the measurement."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times = []
        self._t0: Optional[float] = None
        self._n = 0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, out=None) -> float:
        if out is not None:
            jax.block_until_ready(out)
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    @property
    def best(self) -> float:
        return min(self.times) if self.times else float("nan")


def sync_fence(out):
    """Settle `out` on the host before reading the clock.

    `jax.block_until_ready` alone is NOT a reliable fence on tunneled/proxy
    device platforms (the axon tunnel acks enqueued work before the chip
    finishes — a 66 ms train step "measured" 1.3 ms through it). Fetching
    a scalar to the host is an unfakeable data dependency on the dispatch
    chain; the extra device→host copy of a single element is noise
    (< 0.1 ms) at every geometry benched here. When `out` spans MULTIPLE
    dispatched programs (e.g. a `(live, artifact)` tuple), one leaf's
    scalar only fences that leaf's program — so combine one element of
    EVERY leaf into a single on-device scalar first, then fetch once.
    The combine itself is jitted: ONE dispatched program that depends on
    all leaves (an eager per-leaf loop would enqueue hundreds of tiny
    tunnel dispatches for a parameter tree, contaminating the timing
    window this fence closes); jit caches it per tree structure, and the
    warmup fence before any timed window absorbs the one-off compile.
    The single shared fence for bench.py and scripts/roofline_bn.py —
    keep measurement semantics identical across both."""
    import numpy as np

    jnp = jax.numpy
    jax.block_until_ready(out)
    leaves = jax.tree.leaves(out)
    if len(leaves) == 1:
        np.asarray(jnp.ravel(leaves[0])[0])
    else:
        np.asarray(_fence_combine(leaves))
    return out


@jax.jit
def _fence_combine(leaves):
    jnp = jax.numpy
    acc = jnp.zeros((), jnp.float32)
    for leaf in leaves:
        acc = acc + jnp.ravel(leaf)[0].astype(jnp.float32)
    return acc


@contextlib.contextmanager
def trace_context(trace_dir: Optional[str] = None):
    """jax.profiler trace if trace_dir is set; no-op otherwise."""
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield
