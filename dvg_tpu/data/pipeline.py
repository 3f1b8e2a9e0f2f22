"""Host data pipeline: dataset registry + threaded batch loader.

Replaces the reference's `utils.load_dataset` switch (utils.py:27-81) and
`normalize_data` time-major transpose + per-batch `.cuda()` copy
(utils.py:86-95). TPU-first differences:

  * batches are assembled **time-major** `(T, B, H, W, C)` float32 on the
    host and shipped to device as ONE transfer (optionally sharded with a
    `jax.sharding.NamedSharding`), instead of a transpose + copy per step;
  * loading/decoding runs in a thread pool that prefetches ahead of the
    training step, so the TPU never waits on PNG decode;
  * the native C++ decode path (dvg_tpu.runtime.fastload) is used for PNG
    trees when the shared library is built, with a pure-PIL fallback.
"""

from __future__ import annotations

import threading
import weakref
from collections import deque
from concurrent.futures import CancelledError, ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

from dvg_tpu.config import DVGConfig
from dvg_tpu.data.frames import BAIR, KTH, UCF
from dvg_tpu.data.moving_mnist import MovingMNIST


def load_dataset(cfg: DVGConfig, seq_len: Optional[int] = None,
                 split: str = "both"):
    """Dataset registry (reference utils.py:27-81) → (train, test).

    seq_len defaults to n_past + n_future for training datasets and
    max(n_eval, that) overall, matching the reference's
    `opt.n_past + opt.n_future` / `opt.n_eval` usage.

    split="train"/"test" constructs and returns only that dataset — the
    CLIs need the two splits at DIFFERENT seq_lens, and building the
    unused half costs a full directory scan (BAIR: ~44k trajectory dirs)
    or a metadata re-read (KTH/UCF) at startup.
    """
    T = seq_len if seq_len is not None else max(cfg.seq_len_train, cfg.n_eval)
    name = cfg.dataset.lower()
    if name in ("smmnist", "mnist", "moving_mnist"):
        mk = lambda train: MovingMNIST(
            train=train, data_root=cfg.data_root, seq_len=T,
            num_digits=cfg.num_digits, image_size=cfg.image_width,
            seed=cfg.seed)
    elif name == "bair":
        # seq_len=T exactly: the reference trains RobotPush on
        # n_past+n_future frames (utils.py:49) and its get_seq reads only
        # frames 0..seq_len-1 of the 30-frame trajectories (bair.py:52-55)
        mk = lambda train: BAIR(train=train, data_root=cfg.data_root,
                                seq_len=T, image_size=cfg.image_width,
                                seed=cfg.seed)
    elif name == "kth":
        mk = lambda train: KTH(train=train, data_root=cfg.data_root,
                               seq_len=T, image_size=cfg.image_width,
                               seed=cfg.seed)
    elif name == "ucf":
        mk = lambda train: UCF(train=train, data_root=cfg.data_root,
                               seq_len=T, image_size=cfg.image_width,
                               seed=cfg.seed)
    else:
        raise ValueError(f"unknown dataset {cfg.dataset!r}")
    if split == "train":
        return mk(True)
    if split == "test":
        return mk(False)
    if split != "both":
        raise ValueError(f"split must be train|test|both, got {split!r}")
    return mk(True), mk(False)


def normalize_batch(items) -> np.ndarray:
    """Stack a list of (T, H, W, C) sequences → time-major (T, B, H, W, C).
    The reference does transpose-to-time-major + .cuda() per batch
    (utils.py:86-95); device placement here is the Loader's job."""
    return np.stack(items, axis=1).astype(np.float32)


class Loader:
    """Threaded, prefetching batch loader.

    Yields time-major (T, B, H, W, C) numpy batches endlessly (the reference
    wraps its DataLoader in an endless generator, train.py:119-127). If
    `sharding` is given, batches are `jax.device_put` with it — one fused
    host→device transfer per step, laid out for the mesh.

    Two levels of parallelism, both on PERSISTENT pools (no per-batch
    executor churn): `num_threads` decode workers fan out over the items of
    a batch, and up to `prefetch` whole batches are assembled concurrently
    ahead of the consumer — enough to keep a chip fed from a PNG tree
    (BAIR/KTH geometry) through the native decoder."""

    def __init__(self, dataset, batch_size: int, *, shuffle: bool = True,
                 seed: int = 0, num_threads: int = 4, prefetch: int = 4,
                 sharding=None, device_assemble: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.device_assemble = device_assemble
        self.shuffle = shuffle
        self.seed = seed
        self.num_threads = max(1, num_threads)
        self.prefetch = max(1, prefetch)
        self.sharding = sharding
        self._lock = threading.Lock()
        self._item_pool: Optional[ThreadPoolExecutor] = None
        self._batch_pool: Optional[ThreadPoolExecutor] = None
        self._finalizer = None

    def _pools(self):
        with self._lock:
            if self._item_pool is None:
                self._item_pool = ThreadPoolExecutor(
                    self.num_threads, thread_name_prefix="dvg-item")
            if self._batch_pool is None:
                # one builder per prefetch slot (bounded) so every
                # in-flight batch can actually assemble concurrently
                self._batch_pool = ThreadPoolExecutor(
                    min(self.prefetch, 4), thread_name_prefix="dvg-batch")
            if self._finalizer is None:
                # a consumer that abandons iteration without stop() (both
                # CLIs do) must not leave non-daemon builder threads running
                # prefetch builds — possibly calling jax.device_put during
                # interpreter teardown — so tie pool shutdown to the
                # Loader's lifetime
                self._finalizer = weakref.finalize(
                    self, Loader._shutdown_pools,
                    self._item_pool, self._batch_pool)
            return self._item_pool, self._batch_pool

    @staticmethod
    def _shutdown_pools(item_pool, batch_pool):
        for pool in (item_pool, batch_pool):
            if pool is not None:
                pool.shutdown(wait=False, cancel_futures=True)

    # -- synchronous single batch (used by tests and eval) -------------------
    def next_batch(self, step: int) -> np.ndarray:
        return self._build(step)

    def _indices(self, step: int) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, step))
            # INDEX_PURE datasets (BAIR/KTH/UCF: __getitem__ is a pure
            # function of ANY integer index) get a widened shuffle domain:
            # capping at len() would limit the whole training run to n
            # distinct (video, chunk, start) windows, where the reference
            # draws fresh np.random windows on every access (kth.py:37-44)
            hi = n * 65536 if getattr(self.dataset, "INDEX_PURE", False) else n
            return rng.integers(0, hi, self.batch_size)
        start = (step * self.batch_size) % n
        return (start + np.arange(self.batch_size)) % n

    def _build(self, step: int) -> np.ndarray:
        # multi-process (multi-host) run with a device sharding: each
        # process builds ONLY its own rows of the global batch and
        # contributes its local shards — a host-global device_put would
        # throw on the non-addressable devices. The global batch-row →
        # process assignment follows the mesh's process-major device order
        # (make_mesh uses jax.devices(), which lists process 0's devices
        # first), so process p owns the contiguous row block
        # [p·B/P, (p+1)·B/P). All processes draw the SAME global index list
        # (rng seeded by (seed, step)) and slice it.
        if self.sharding is not None:
            import jax
            if jax.process_count() > 1:
                return self._build_process_local(step)
        # fastest path: synthetic datasets that assemble frames ON DEVICE —
        # the host only computes trajectories (KBs), keeping the feed thread
        # off the critical path entirely
        if self.device_assemble and hasattr(self.dataset, "device_batch"):
            batch = self.dataset.device_batch(
                self.batch_size, start_index=step * self.batch_size)
            if self.sharding is not None:
                import jax
                batch = jax.device_put(batch, self.sharding)
            return batch
        # fast path: vectorized synthetic generator
        if hasattr(self.dataset, "sample_batch"):
            batch = self.dataset.sample_batch(
                self.batch_size, start_index=step * self.batch_size)
        else:
            idxs = self._indices(step)
            if self.num_threads > 1:
                pool, _ = self._pools()
                items = list(pool.map(lambda i: self.dataset[int(i)][0], idxs))
            else:
                items = [self.dataset[int(i)][0] for i in idxs]
            batch = normalize_batch(items)
        if self.sharding is not None:
            import jax
            batch = jax.device_put(batch, self.sharding)
        return batch

    def _build_process_local(self, step: int):
        """Per-process slice of the global batch, assembled into a global
        jax.Array (SURVEY.md §5.8 / jax.make_array_from_process_local_data)."""
        import jax
        pc, pid = jax.process_count(), jax.process_index()
        if self.batch_size % pc:
            raise ValueError(
                f"global batch {self.batch_size} must divide evenly over "
                f"{pc} processes")
        per = self.batch_size // pc
        if hasattr(self.dataset, "sample_batch"):
            # synthetic batch streams are seeded by (seed, start, SIZE) —
            # a half-batch at a shifted start is NOT a slice of the global
            # batch. Generate the full deterministic global batch (host-side
            # trajectory math, a few ms) and slice this process's rows, so
            # every device sees exactly what the single-process run feeds.
            full = np.asarray(self.dataset.sample_batch(
                self.batch_size, start_index=step * self.batch_size))
            local = full[:, pid * per:(pid + 1) * per]
        else:
            idxs = self._indices(step)[pid * per:(pid + 1) * per]
            if self.num_threads > 1:
                pool, _ = self._pools()
                items = list(pool.map(lambda i: self.dataset[int(i)][0], idxs))
            else:
                items = [self.dataset[int(i)][0] for i in idxs]
            local = normalize_batch(items)
        return jax.make_array_from_process_local_data(self.sharding, local)

    # -- endless prefetching iterator ----------------------------------------
    def __iter__(self) -> Iterator:
        return self.iter_from(0)

    def iter_from(self, start_step: int) -> Iterator:
        """Endless prefetching iterator whose first batch is `start_step`'s.
        A resumed run (cli/train.py --resume) continues the (seed, step)
        data stream at the checkpointed step instead of replaying the
        sequence already trained on from step 0.

        Keeps `prefetch` batch futures in flight on the persistent batch
        pool; exceptions surface to the consumer in step order (in-flight
        successors are cancelled first). `stop()` ends iteration cleanly."""
        _, bpool = self._pools()
        futures = deque(bpool.submit(self._build, start_step + s)
                        for s in range(self.prefetch))
        step = start_step + self.prefetch
        while True:
            fut = futures.popleft()
            try:
                batch = fut.result()       # raises the failing step's error
            except CancelledError:         # stop() cancelled the pipeline
                return
            except BaseException:
                for f in futures:          # don't leak unretrieved errors
                    f.cancel()
                    if f.done() and not f.cancelled():
                        f.exception()      # swallow sibling errors quietly
                raise
            try:
                futures.append(bpool.submit(self._build, step))
            except RuntimeError:           # pool shut down via stop()
                yield batch
                return
            step += 1
            yield batch

    def stop(self):
        with self._lock:
            if self._finalizer is not None:
                self._finalizer.detach()
                self._finalizer = None
            Loader._shutdown_pools(self._item_pool, self._batch_pool)
            self._item_pool = self._batch_pool = None
