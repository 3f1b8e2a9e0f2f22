"""Pallas TPU kernel: fused SSIM + PSNR over a batch of images.

The eval hot path of the framework scores every generated frame against
ground truth (reference utils.py:220-234 did this on host CPU, one skimage
call per (batch, frame, channel) — SURVEY.md §3's "CPU skimage SSIM over
100x50x100 frames" bottleneck). The XLA path (ops/ssim.py) already batches
the windowed moments; this kernel goes one step further and performs the
WHOLE metric in one pass per image block:

  * one HBM read of (gt, pred) tiles into VMEM;
  * the 7x7 uniform-window moments as banded-matrix matmuls on the MXU
    (box filter == W_h @ X @ W_w^T with 0/1-banded weight matrices — two
    small matmuls per moment instead of a sliding window);
  * SSIM statistics + map mean + PSNR on the VPU (fixed data_range = 2.0 —
    no per-image max/min mode on this path);
  * one scalar triple (ssim, psnr, mse) written per image — the
    (N, h', w') moment maps never touch HBM, and the MSE (already computed
    for PSNR) comes out for free, so callers need no separate MSE pass.

Semantics identical to ops/ssim.py `ssim_psnr_batch` (skimage ≤0.17
compare_ssim/compare_psnr float defaults: uniform window, unbiased
covariances, data_range = 2.0).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dvg_tpu.ops.ssim import DATA_RANGE as _DATA_RANGE

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:                                   # pragma: no cover
    _PALLAS_OK = False


def _resolve_interpret(interpret) -> bool:
    """Default: compiled on TPU, interpreter elsewhere — `use_pallas` paths
    then run (slowly but correctly) on the CPU test backend too."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return bool(interpret)


def _vmem_budget_floats() -> int:
    """Float budget for the kernel's live working set (the 7-map moment
    stack + its filtered copy, ~23·K·H·W floats across the schedule).

    16·64·64 was calibrated on v5e (16 MB scoped VMEM: block 16 at 64x64
    fits with headroom). Rather than hardcoding that for every chip
    generation, probe the device's actual VMEM capacity when the runtime
    exposes it and scale the calibrated budget proportionally; fall back to
    the v5e number otherwise. Overridable via DVG_PALLAS_VMEM_FLOATS for a
    chip where the probe lies."""
    import os
    env = os.environ.get("DVG_PALLAS_VMEM_FLOATS")
    if env:
        return int(env)
    base = 16 * 64 * 64          # calibrated against 16 MB (v5e)
    try:
        d = jax.devices()[0]
        stats = d.memory_stats() or {}
        # some PJRT TPU runtimes expose the on-chip pool; absent → default
        vmem_bytes = stats.get("vmem_bytes_limit")
        if vmem_bytes and 4 * 2**20 <= vmem_bytes <= 2**30:
            return int(base * (vmem_bytes / (16 * 2**20)))
    except Exception:
        pass
    return base


def _max_block(h: int, w: int) -> int:
    """Largest image block whose working set fits the scoped-VMEM budget
    (see _vmem_budget_floats). Too big → Mosaic fails to allocate at
    COMPILE time (loud, not silent corruption); too small only costs grid
    steps."""
    return max(1, _vmem_budget_floats() // (h * w))


def _band(out_size: int, in_size: int, win: int) -> np.ndarray:
    m = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        m[i, i:i + win] = 1.0 / win
    return m


def _image_mean(x):
    """(K, H, W) → (K, 1, 1) per-image mean via single-axis reduces only
    (multi-axis/rank-1 reduces and lane-merging reshapes hit unsupported
    Mosaic layout casts)."""
    return jnp.mean(jnp.mean(x, axis=2), axis=1, keepdims=True)[:, :, None]


def _box_moments(stack, ww, win: int, hp: int):
    """Uniform-window moments of a (R, H, W) stack of maps at once (box ==
    W_h @ X @ W_w^T): the W direction as ONE large MXU matmul
    ((R·H, W) @ (W, W') — per-image (64,64) dots starve the MXU at
    ~9 TFLOP/s), the H direction as `win` shifted-slice adds on the VPU
    (a banded matmul from the left would need a 3-D transpose Mosaic
    does not lower; the sliding sum is win adds of VMEM-resident tiles).
    Returns (R, H', W')."""
    r, h, w = stack.shape
    wp = ww.shape[0]
    y = jnp.dot(stack.reshape(r * h, w), ww.T,
                preferred_element_type=jnp.float32)  # (R·H, W')
    y = y.reshape(r, h, wp)
    m = y[:, :hp]
    for d in range(1, win):
        m = m + y[:, d:d + hp]
    return m * (1.0 / win)                           # (R, H', W')


def _ssim_tail(i, k, hw, cov_norm, ux, uy, bux, buy, bxx, byy, bxy,
               gt, pred, ssim_ref, psnr_ref, mse_ref):
    """Shared SSIM-statistics / PSNR / MSE epilogue + output stores.

    ux/uy are boxed raw means, b* are boxed CENTERED moments (centering
    keeps the variance cancellations uxx - ux² free of the large DC term —
    raw second moments lose ~3 digits)."""
    vx = cov_norm * (bxx - bux * bux)
    vy = cov_norm * (byy - buy * buy)
    vxy = cov_norm * (bxy - bux * buy)
    c1 = (0.01 * _DATA_RANGE) ** 2
    c2 = (0.03 * _DATA_RANGE) ** 2
    s_map = ((2.0 * ux * uy + c1) * (2.0 * vxy + c2)
             / ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2)))
    ssim_vals = jnp.mean(jnp.mean(s_map, axis=2), axis=1,
                         keepdims=True)              # (K, 1)
    d2 = (gt - pred) ** 2
    mse = jnp.sum(jnp.sum(d2, axis=2), axis=1, keepdims=True) / hw
    psnr_vals = 10.0 * jnp.log10(_DATA_RANGE ** 2 / jnp.maximum(mse, 1e-12))

    # outputs are tiny (grid, block) arrays held whole in VMEM; each program
    # writes its row as one 2-D (1, block) vector store (scalar and rank-1
    # stores to VMEM are illegal / layout-fragile)
    ssim_ref[pl.dslice(i, 1), :] = ssim_vals.reshape(1, k)
    psnr_ref[pl.dslice(i, 1), :] = psnr_vals.reshape(1, k)
    # per-image MSE falls out of the PSNR computation for free; emitting it
    # lets the rollout drop its expanded-form einsum MSE (and the f32 copy
    # of every generated frame it dragged in) — and the DIRECT Σ(x−g)² here
    # is numerically better than the Σx²−2xg+Σg² caller-side form at
    # trained-model MSE scale (rollout.py metrics_of precision note).
    mse_ref[pl.dslice(i, 1), :] = mse.reshape(1, k)


def _kernel(gt_ref, pred_ref, ww_ref, ssim_ref, psnr_ref, mse_ref,
            *, win: int, hw: int, block: int):
    ww = ww_ref[...]                                 # (W-win+1, W)
    n = win * win
    cov_norm = n / (n - 1.0)
    i = pl.program_id(0)
    h, w = gt_ref.shape[-2], gt_ref.shape[-1]
    hp = h - win + 1
    k = block

    gt = gt_ref[...].astype(jnp.float32)             # (K, H, W)
    pred = pred_ref[...].astype(jnp.float32)

    # Box only CENTERED maps; the raw first moments are recovered by adding
    # the per-image mean back (box is linear and mean-preserving, so
    # box(raw) == box(centered) + mean) — 5 moment rows instead of 7.
    mg = _image_mean(gt)                             # (K, 1, 1)
    mp = _image_mean(pred)
    gc = gt - mg
    pc = pred - mp

    stack = jnp.concatenate([gc, pc, gc * gc, pc * pc, gc * pc],
                            axis=0)                  # (5K, H, W)
    m = _box_moments(stack, ww, win, hp)             # (5K, H', W')
    bux, buy = m[:k], m[k:2 * k]                     # box of centered
    bxx, byy = m[2 * k:3 * k], m[3 * k:4 * k]
    bxy = m[4 * k:]
    ux = bux + mg                                    # box of raw images
    uy = buy + mp

    _ssim_tail(i, k, hw, cov_norm, ux, uy, bux, buy, bxx, byy, bxy,
               gt, pred, ssim_ref, psnr_ref, mse_ref)


def _kernel_pre(gt_ref, pred_ref, ww_ref, gux_ref, gxx_ref,
                ssim_ref, psnr_ref, mse_ref,
                *, win: int, hw: int, block: int):
    """Cyclic-gt kernel variant consuming PRECOMPUTED gt-side windowed
    moments (gux = box(gt − mean), gxx = box((gt − mean)²), from
    _gt_box_moments). In the diverse layout every gt image is scored
    against S (=100) samples, so its boxed moments are loop-invariant
    across the sample axis — hoisting them drops the in-kernel moment
    stack from 5 rows to 3 (pc, pc², gc·pc), ~40% of the kernel's VPU
    work (H-direction sliding sums + stack build)."""
    ww = ww_ref[...]                                 # (W-win+1, W)
    n = win * win
    cov_norm = n / (n - 1.0)
    i = pl.program_id(0)
    h, w = gt_ref.shape[-2], gt_ref.shape[-1]
    hp = h - win + 1
    k = block

    gt = gt_ref[...].astype(jnp.float32)             # (K, H, W)
    pred = pred_ref[...].astype(jnp.float32)

    mg = _image_mean(gt)                             # (K, 1, 1)
    mp = _image_mean(pred)
    gc = gt - mg                                     # needed for the cross
    pc = pred - mp

    stack = jnp.concatenate([pc, pc * pc, gc * pc], axis=0)   # (3K, H, W)
    m = _box_moments(stack, ww, win, hp)             # (3K, H', W')
    buy = m[:k]
    byy, bxy = m[k:2 * k], m[2 * k:]
    bux = gux_ref[...]                               # precomputed gt side
    bxx = gxx_ref[...]
    ux = bux + mg
    uy = buy + mp

    _ssim_tail(i, k, hw, cov_norm, ux, uy, bux, buy, bxx, byy, bxy,
               gt, pred, ssim_ref, psnr_ref, mse_ref)


def _gt_box_moments(gt: jnp.ndarray, ww: jnp.ndarray, win: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """XLA-side precompute of the gt-only windowed moments for _kernel_pre:
    gt (G, H, W) → (box(gt−mean), box((gt−mean)²)) each (G, H', W') f32.
    Same banded-matmul + shifted-sum pipeline as the kernel, at 1/S of the
    hot path's volume (G images vs S·G), so XLA's version is negligible."""
    g32 = gt.astype(jnp.float32)
    mg = jnp.mean(g32, axis=(1, 2), keepdims=True)
    gc = g32 - mg
    h = gt.shape[1]
    hp = h - win + 1
    stack = jnp.concatenate([gc, gc * gc], axis=0)   # (2G, H, W)
    m = _box_moments(stack, ww, win, hp)
    g = gt.shape[0]
    return m[:g], m[g:]


def _mse_fallback(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W) direct per-image MSE for the no-Pallas fallback paths."""
    d = gt.astype(jnp.float32) - pred.astype(jnp.float32)
    return jnp.mean(d * d, axis=(1, 2))


def ssim_psnr_images(gt: jnp.ndarray, pred: jnp.ndarray, win: int = 7,
                     block: int = 8, interpret: bool = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-image SSIM/PSNR/MSE for (N, H, W) single-channel batches →
    ((N,), (N,), (N,)).

    N must be a multiple of `block` (callers pad). Falls back to the XLA
    path when Pallas is unavailable."""
    n, h, w = gt.shape
    if not _PALLAS_OK:                               # pragma: no cover
        from dvg_tpu.ops.ssim import ssim_psnr_batch
        s, q = ssim_psnr_batch(gt[..., None], pred[..., None], win)
        return s, q, _mse_fallback(gt, pred)
    interpret = _resolve_interpret(interpret)
    block = min(block, _max_block(h, w))   # resolution-scaled VMEM budget
    assert n % block == 0, (n, block)
    ww = jnp.asarray(_band(w - win + 1, w, win))
    grid = (n // block,)
    kern = functools.partial(_kernel, win=win, hw=h * w, block=block)
    # rank-1 outputs with tiny blocks violate TPU lane tiling; emit
    # (grid, block) 2-D outputs and flatten after
    out_shape = tuple(jax.ShapeDtypeStruct((n // block, block), jnp.float32)
                      for _ in range(3))
    ssim, psnr, mse = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w - win + 1, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(pl.BlockSpec((n // block, block), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
                        for _ in range(3)),
        out_shape=out_shape,
        interpret=interpret,
    )(gt, pred, ww)
    return ssim.reshape(n), psnr.reshape(n), mse.reshape(n)


def ssim_psnr_cyclic(gt: jnp.ndarray, pred: jnp.ndarray, win: int = 7,
                     interpret: bool = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pairwise kernel with a CYCLIC gt: gt (G, H, W) single-channel images,
    pred (N, H, W) with N = S·G laid out so pred row p scores against
    gt row p % G (the diverse-sample layout: samples repeat the gt batch).
    The gt never materializes S times in HBM — its blocks are re-read via
    the index map. Returns ((N,), (N,), (N,)) = (ssim, psnr, mse)."""
    g, h, w = gt.shape
    n = pred.shape[0]
    assert n % g == 0, (n, g)
    # block must divide G so a pred block maps to one contiguous gt block,
    # and must fit the resolution-scaled VMEM budget
    cap = _max_block(h, w)
    block = next(bk for bk in (16, 10, 8, 6, 5, 4, 3, 2, 1)
                 if g % bk == 0 and bk <= cap)
    if not _PALLAS_OK:                               # pragma: no cover
        from dvg_tpu.ops.ssim import ssim_psnr_batch
        reps = n // g
        gt_full = jnp.tile(gt, (reps, 1, 1))
        s, q = ssim_psnr_batch(gt_full[..., None], pred[..., None], win)
        return s, q, _mse_fallback(gt_full, pred)
    interpret = _resolve_interpret(interpret)
    ww = jnp.asarray(_band(w - win + 1, w, win))
    gpb = g // block                                  # gt blocks per cycle
    hp, wp = h - win + 1, w - win + 1
    # gt-side windowed moments are loop-invariant across the S samples that
    # score against each gt row — precompute them ONCE per gt image in XLA
    # and stream them into the kernel via the same cyclic index map
    gux, gxx = _gt_box_moments(gt, ww, win)           # (G, H', W') each
    kern = functools.partial(_kernel_pre, win=win, hw=h * w, block=block)
    out_shape = tuple(jax.ShapeDtypeStruct((n // block, block), jnp.float32)
                      for _ in range(3))
    ssim, psnr, mse = pl.pallas_call(
        kern,
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((block, h, w), lambda i: (i % gpb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w - win + 1, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, hp, wp), lambda i: (i % gpb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, hp, wp), lambda i: (i % gpb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(pl.BlockSpec((n // block, block), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
                        for _ in range(3)),
        out_shape=out_shape,
        interpret=interpret,
    )(gt, pred, ww, gux, gxx)
    return ssim.reshape(n), psnr.reshape(n), mse.reshape(n)


def ssim_psnr_batch_pallas_cyclic(gt: jnp.ndarray, pred: jnp.ndarray,
                                  win: int = 7, interpret: bool = None
                                  ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                             jnp.ndarray]:
    """Channel-averaged metrics for the diverse layout: gt (B, H, W, C),
    pred (S·B, H, W, C) sample-major (rows s·B + b) →
    ((S·B,), (S·B,), (S·B,)) = (ssim, psnr, mse). The channel-mean of the
    per-channel MSEs equals the full-image MSE (equal pixel counts)."""
    b, h, w, c = gt.shape
    n = pred.shape[0]
    gt_i = jnp.transpose(gt, (0, 3, 1, 2)).reshape(b * c, h, w)
    pred_i = jnp.transpose(pred, (0, 3, 1, 2)).reshape(n * c, h, w)
    s_v, q_v, m_v = ssim_psnr_cyclic(gt_i, pred_i, win, interpret)
    return (s_v.reshape(n, c).mean(axis=1), q_v.reshape(n, c).mean(axis=1),
            m_v.reshape(n, c).mean(axis=1))


def ssim_psnr_batch_pallas(gt: jnp.ndarray, pred: jnp.ndarray, win: int = 7,
                           interpret: bool = None
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Channel-averaged drop-in for ops.ssim.ssim_psnr_batch on NHWC input
    (plus a third per-image MSE output the XLA path does not compute)."""
    b, h, w, c = gt.shape
    gt_i = jnp.transpose(gt, (0, 3, 1, 2)).reshape(b * c, h, w)
    pred_i = jnp.transpose(pred, (0, 3, 1, 2)).reshape(b * c, h, w)
    n = b * c
    block = min(8, _max_block(h, w))
    pad = (-n) % block
    if pad:
        gt_i = jnp.concatenate([gt_i, jnp.ones((pad, h, w), gt_i.dtype)])
        pred_i = jnp.concatenate([pred_i, jnp.ones((pad, h, w),
                                                   pred_i.dtype)])
    s, q, m = ssim_psnr_images(gt_i, pred_i, win, block, interpret)
    s = s[:n].reshape(b, c).mean(axis=1)
    q = q[:n].reshape(b, c).mean(axis=1)
    m = m[:n].reshape(b, c).mean(axis=1)
    return s, q, m
