"""Moving-MNIST: on-the-fly bouncing-digit video generator.

Behavioral parity with /root/reference/data/moving_mnist.py:5-91:
  * `num_digits` (default 2) 32-px digits bouncing on a 64-px canvas;
  * uniform random start position and integer velocity in [-4, 4];
  * on wall contact the digit reflects; in the default *stochastic* mode
    (``deterministic=False``) the outgoing velocity is redrawn at random —
    this is the stochasticity the GP trigger is meant to capture;
  * overlapping digits are summed then clamped to 1 (`x[x>1]=1`).

Differences (on purpose, documented):
  * the reference seeds numpy once per DataLoader worker
    (moving_mnist.py:30-33), making samples depend on worker count; here
    every ``__getitem__`` derives its RNG from ``(seed, index)`` so the
    dataset is a pure function — any loader, any process layout, same data.
  * digits come from raw MNIST idx files under ``data_root`` when present
    (no torchvision dependency); otherwise a deterministic procedural glyph
    bank is used so the dataset is runnable with zero downloads (the
    BASELINE.json "CPU-runnable" config).
  * `sample_batch` produces a whole (T, B, H, W, C) batch with a single
    vectorized numpy pass — the generator feeds the training hot loop, so
    it must outrun the TPU, not one frame at a time.
"""

from __future__ import annotations

import gzip
import os
import struct
from typing import Optional, Tuple

import numpy as np

_MNIST_DIRS = ("", "MNIST/raw/", "mnist/")


def _mnist_file_exists(data_root: str, train: bool) -> bool:
    stem = "train-images-idx3-ubyte" if train else "t10k-images-idx3-ubyte"
    return any(
        os.path.exists(os.path.join(data_root, d + stem + suffix))
        for d in _MNIST_DIRS for suffix in ("", ".gz"))


def _load_mnist_images(data_root: str,
                       train: bool = True) -> Optional[np.ndarray]:
    """Read raw MNIST idx images (optionally .gz) → (N, 28, 28) float32
    [0,1]. The split selects the image FILE — train-images vs t10k-images —
    like the reference's datasets.MNIST(train=train) (moving_mnist.py:20-26),
    so eval sequences use held-out digits."""
    stem = "train-images-idx3-ubyte" if train else "t10k-images-idx3-ubyte"
    corrupt = []
    for rel in (d + stem for d in _MNIST_DIRS):
        for suffix, opener in (("", open), (".gz", gzip.open)):
            path = os.path.join(data_root, rel + suffix)
            if not os.path.exists(path):
                continue
            with opener(path, "rb") as f:
                header = f.read(16)
                if len(header) < 16:
                    corrupt.append(path)
                    continue
                magic, n, rows, cols = struct.unpack(">IIII", header)
                if magic != 2051:
                    corrupt.append(path)
                    continue
                buf = f.read(n * rows * cols)
            arr = np.frombuffer(buf, dtype=np.uint8).reshape(n, rows, cols)
            return arr.astype(np.float32) / 255.0
    if corrupt:
        # Present but unreadable is NOT 'not found': a glyph fallback here
        # would silently swap the data distribution under a data_root the
        # caller believes holds real MNIST.
        raise ValueError(
            f"MNIST idx file(s) present but unreadable (bad/short magic "
            f"header, expected 2051): {corrupt} — re-download the file; "
            "refusing to fall back to procedural glyphs for an explicitly "
            "provided data_root")
    return None


def _procedural_digits(num: int = 256, size: int = 28,
                       seed: int = 1234) -> np.ndarray:
    """Deterministic digit-like glyphs (anti-aliased strokes) used when no
    MNIST file is on disk. Statistics (sparse bright strokes on black)
    approximate MNIST well enough for pipeline/perf work and tests.
    Train/test use different seeds so the splits are glyph-disjoint, like
    the real train/t10k image sets."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    glyphs = np.zeros((num, size, size), np.float32)
    for i in range(num):
        g = np.zeros((size, size), np.float32)
        for _ in range(rng.integers(2, 5)):
            # random quadratic stroke
            p = rng.uniform(4, size - 4, (3, 2)).astype(np.float32)
            t = np.linspace(0, 1, 40, dtype=np.float32)[:, None]
            pts = ((1 - t) ** 2 * p[0] + 2 * t * (1 - t) * p[1] + t ** 2 * p[2])
            for cy, cx in pts:
                g += np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2)
                              / (2.0 * 1.2 ** 2)))
        glyphs[i] = np.clip(g, 0.0, 1.0)
    return glyphs


class MovingMNIST:
    """Map-style dataset: `ds[i]` → ((T, H, W, 1) float32 in [0,1], 0)."""

    def __init__(self, train: bool = True, data_root: str = "",
                 seq_len: int = 20, num_digits: int = 2,
                 image_size: int = 64, digit_size: int = 32,
                 deterministic: bool = False, seed: int = 1,
                 epoch_size: int = 0):
        self.seq_len = seq_len
        self.num_digits = num_digits
        self.image_size = image_size
        self.digit_size = digit_size
        self.deterministic = deterministic
        self.channels = 1
        # train/test draw from disjoint RNG streams
        self.seed = (seed * 2 + (0 if train else 1)) * 0x9E3779B1
        self._len = epoch_size if epoch_size else (60000 if train else 10000)

        digits = (_load_mnist_images(data_root, train=train)
                  if data_root else None)
        if digits is None:
            if data_root:
                # an explicit data_root promises real MNIST — never swap
                # in glyphs silently. Mixing real digits on one split with
                # glyphs on the other would score eval against a different
                # data distribution than training, so that case is fatal.
                split, stem = (("train", "train-images-idx3-ubyte") if train
                               else ("test", "t10k-images-idx3-ubyte"))
                msg = (f"MNIST {split}-split images ({stem}[.gz]) not found "
                       f"under {data_root!r} (searched {_MNIST_DIRS}); "
                       "falling back to procedural glyphs for this split")
                if _mnist_file_exists(data_root, train=not train):
                    raise FileNotFoundError(
                        msg + " — but the OTHER split's idx file IS present, "
                        "so train and eval would use different data "
                        "distributions. Download the missing idx file "
                        "(both splits ship in every MNIST mirror).")
                import warnings
                warnings.warn(msg, stacklevel=2)
            digits = _procedural_digits(seed=1234 if train else 4321)
        if digit_size != digits.shape[-1]:
            digits = _resize_bilinear(digits, digit_size)
        self.digits = digits

    def __len__(self) -> int:
        return self._len

    # -- single sequence ---------------------------------------------------
    def __getitem__(self, index: int) -> Tuple[np.ndarray, int]:
        rng = np.random.default_rng((self.seed, index))
        x = self._generate(rng, 1)[:, 0]
        return x, 0

    # -- vectorized batch (the fast path) ------------------------------------
    def sample_batch(self, batch_size: int, start_index: int = 0) -> np.ndarray:
        """(T, B, H, W, 1) float32 batch.

        Deterministic in (seed, start_index, batch_size) — the WHOLE batch
        draws from one interleaved vectorized stream, so row b is NOT
        `ds[start_index + b]` and a different batch_size yields different
        data for the same start. Consumers that need row-sliceable batches
        (the multi-host Loader) must generate the full global batch and
        slice it (pipeline.py::_build_process_local does exactly this)."""
        rng = np.random.default_rng((self.seed, start_index, batch_size))
        return self._generate(rng, batch_size)

    # -- device-assembled batch (the TPU-feed fast path) ----------------------
    def batch_parts(self, batch_size: int, start_index: int = 0):
        """Host side of device assembly: (trajectories (T, n, 2) int32,
        sprites (n, dsz, dsz) f32) — a few KB of integer math instead of
        30 ms of numpy blitting on the feed thread."""
        rng = np.random.default_rng((self.seed, start_index, batch_size))
        traj, sprites = self._trajectories(rng, batch_size)
        return traj.astype(np.int32), sprites

    def device_batch(self, batch_size: int, start_index: int = 0):
        """(T, B, H, W, 1) batch assembled ON DEVICE (jitted scatter-add)."""
        import jax
        traj, sprites = self.batch_parts(batch_size, start_index)
        return _assemble_device(
            jax.numpy.asarray(traj), jax.numpy.asarray(sprites),
            batch_size, self.image_size, self.num_digits)

    def _trajectories(self, rng: np.random.Generator, b: int):
        """Sample digit ids + bouncing trajectories: ((T, n, 2) positions,
        (n, dsz, dsz) sprites), n = b * num_digits."""
        t_len, size, dsz, nd = (self.seq_len, self.image_size,
                                self.digit_size, self.num_digits)
        lim = size - dsz
        n = b * nd
        idx = rng.integers(0, len(self.digits), n)
        sprites = self.digits[idx]                      # (n, dsz, dsz)
        # start positions randint(0, size - dsz) → [0, lim-1]
        # (reference moving_mnist.py:52-53)
        pos = rng.integers(0, lim, (n, 2)).astype(np.int64)       # (y, x)
        vel = rng.integers(-4, 5, (n, 2)).astype(np.int64)

        traj = np.zeros((t_len, n, 2), np.int64)
        for t in range(t_len):
            # bounce triggers at pos >= lim and clamps to lim-1
            # (reference moving_mnist.py:56-64)
            under = pos < 0
            over = pos >= lim
            if under.any() or over.any():
                if self.deterministic:
                    vel = np.where(under | over, -vel, vel)
                else:
                    # stochastic bounce (reference moving_mnist.py:56-79):
                    # each colliding axis redraws AWAY from its wall and
                    # the other axis redraws over the full [-4,4]. The
                    # reference runs the y branch THEN the x branch, so on
                    # a simultaneous corner hit the x branch's full-range
                    # dy redraw OVERWRITES the y branch's away-from-wall
                    # dy: final corner velocity is (dy∈[-4,4], dx away).
                    new_mag = rng.integers(1, 5, (n, 2))
                    new_other = rng.integers(-4, 5, (n, 2))
                    away = np.where(under, new_mag, -new_mag)   # per axis
                    hit = under | over
                    y_hit, x_hit = hit[:, 0:1], hit[:, 1:2]
                    dy = np.where(x_hit, new_other[:, 0:1],
                                  np.where(y_hit, away[:, 0:1], vel[:, 0:1]))
                    dx = np.where(x_hit, away[:, 1:2],
                                  np.where(y_hit, new_other[:, 1:2],
                                           vel[:, 1:2]))
                    vel = np.concatenate([dy, dx], axis=1)
                pos = np.where(under, 0, np.where(over, lim - 1, pos))
            traj[t] = pos
            pos = pos + vel
        return traj, sprites

    def _generate(self, rng: np.random.Generator, b: int) -> np.ndarray:
        t_len, size, dsz, nd = (self.seq_len, self.image_size,
                                self.digit_size, self.num_digits)
        traj, sprites = self._trajectories(rng, b)

        # batched blits: one fancy-indexed add per (frame, digit-slot) —
        # within a statement every (row, y, x) target is unique (one sprite
        # per batch row), so buffered += is exact; slots accumulate
        # sequentially like the reference's per-digit adds
        ar = np.arange(dsz)
        ys = traj[:, :, 0, None] + ar                   # (T, n, dsz)
        xs = traj[:, :, 1, None] + ar
        rows = np.arange(b)[:, None, None]
        x = np.zeros((t_len, b, size, size, 1), np.float32)
        spr = sprites.reshape(b, nd, dsz, dsz)
        ys = ys.reshape(t_len, b, nd, dsz)
        xs = xs.reshape(t_len, b, nd, dsz)
        for t in range(t_len):
            for d in range(nd):
                x[t, rows, ys[t, :, d, :, None], xs[t, :, d, None, :], 0] \
                    += spr[:, d]
        np.clip(x, 0.0, 1.0, out=x)
        return x


_ASSEMBLE_CACHE = {}


def _assemble_device(traj, sprites, b: int, size: int, nd: int):
    """Scatter-add the sprites onto the canvas on device (jit-cached):
    traj (T, n, 2) int32, sprites (n, d, d) → (T, B, size, size, 1) f32."""
    import jax
    fn = _ASSEMBLE_CACHE.get("fn")
    if fn is None:
        fn = jax.jit(_assemble_body, static_argnums=(2, 3, 4))
        _ASSEMBLE_CACHE["fn"] = fn
    return fn(traj, sprites, b, size, nd)


def _assemble_body(traj, sprites, b: int, size: int, nd: int):
    import jax.numpy as jnp
    t_len, n = traj.shape[0], traj.shape[1]
    dsz = sprites.shape[-1]
    ar = jnp.arange(dsz)
    ys = traj[:, :, 0, None] + ar                       # (T, n, d)
    xs = traj[:, :, 1, None] + ar
    bi = (jnp.arange(n) // nd)                           # (n,)
    lin = (((jnp.arange(t_len)[:, None] * b + bi[None, :])[:, :, None, None]
            * size + ys[:, :, :, None]) * size + xs[:, :, None, :])
    flat = jnp.zeros((t_len * b * size * size,), jnp.float32)
    vals = jnp.broadcast_to(sprites[None], (t_len, n, dsz, dsz))
    flat = flat.at[lin.reshape(-1)].add(vals.reshape(-1))
    x = flat.reshape(t_len, b, size, size, 1)
    return jnp.clip(x, 0.0, 1.0)


def _resize_bilinear(imgs: np.ndarray, out: int) -> np.ndarray:
    """28→32 digit upscale matching the reference's torchvision
    `transforms.Scale(32)` (moving_mnist.py:24): PIL BILINEAR on the
    uint8 image, THEN the /255 to float — PIL rounds the interpolated
    values to uint8 before ToTensor does the division, so resizing the
    float image directly would differ in the low bits. One-time cost at
    dataset construction."""
    from PIL import Image

    u8 = (np.clip(imgs, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    res = np.empty((imgs.shape[0], out, out), np.uint8)
    for i in range(imgs.shape[0]):
        res[i] = np.asarray(Image.fromarray(u8[i], mode="L")
                            .resize((out, out), Image.BILINEAR))
    return res.astype(np.float32) / 255.0
