"""Minimal functional layer library (TPU-native, NHWC).

Every layer is a pair of pure functions:

    params          = <layer>_init(key, ...)
    y[, new_stats]  = <layer>_apply(params, x, ...)

Parameters are plain nested dicts (pytrees), so they thread naturally through
`jax.lax.scan` carries, `vmap`, `grad`, sharding annotations, and msgpack
checkpoints — no module/state machinery. BatchNorm statistics are explicit
values returned from apply, never hidden mutation, which is what makes the
per-frame BN-in-train-mode semantics of the reference reproducible inside a
scanned time loop (reference applies BN per frame per step,
/root/reference/models/dcgan_64.py:8-10).

Weight init matches /root/reference/utils.py:304-311: conv/linear weights
~ N(0, 0.02), biases 0; BatchNorm scale ~ N(1, 0.02), bias 0.

Layout notes (TPU-first):
  * images are NHWC (XLA's preferred TPU conv layout), not the reference's
    NCHW; conv kernels are HWIO;
  * conv channel counts in this model family are multiples of 64 → they tile
    the 128x128 MXU and 8x128 VPU cleanly in f32 and bf16.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, Any]

# ---------------------------------------------------------------------------
# initializers (reference utils.py:304-311)
# ---------------------------------------------------------------------------

WEIGHT_STD = 0.02


def normal_init(key, shape, std=WEIGHT_STD, mean=0.0, dtype=jnp.float32):
    return mean + std * jax.random.normal(key, shape, dtype)


def acc_type(dtype):
    """Accumulation dtype: at least f32 (bf16 compute accumulates in f32 on
    the MXU); wider dtypes (f64 parity tests) keep their own precision."""
    return jnp.promote_types(dtype, jnp.float32)


# ---------------------------------------------------------------------------
# linear
# ---------------------------------------------------------------------------

def linear_init(key, in_dim: int, out_dim: int) -> Params:
    return {
        "w": normal_init(key, (in_dim, out_dim)),
        "b": jnp.zeros((out_dim,), jnp.float32),
    }


def linear_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    # accumulate in f32 on the MXU, keep the compute dtype downstream
    y = jnp.dot(x, p["w"], preferred_element_type=acc_type(x.dtype)) + p["b"]
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# conv2d (NHWC, HWIO)
# ---------------------------------------------------------------------------

def conv2d_init(key, in_ch: int, out_ch: int, k: int) -> Params:
    return {
        "w": normal_init(key, (k, k, in_ch, out_ch)),
        "b": jnp.zeros((out_ch,), jnp.float32),
    }


def conv2d_apply(p: Params, x: jnp.ndarray, stride: int = 1,
                 padding: int = 0) -> jnp.ndarray:
    """Torch-style Conv2d(k, stride, padding) on NHWC input."""
    y = lax.conv_general_dilated(
        x, p["w"],
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"]


def conv3d_init(key, in_ch: int, out_ch: int, k: Tuple[int, int, int]) -> Params:
    kd, kh, kw = k
    return {
        "w": normal_init(key, (kd, kh, kw, in_ch, out_ch)),
        "b": jnp.zeros((out_ch,), jnp.float32),
    }


def conv3d_apply(p: Params, x: jnp.ndarray, stride=(1, 1, 1),
                 padding=(0, 0, 0)) -> jnp.ndarray:
    """Torch-style Conv3d on NDHWC input."""
    y = lax.conv_general_dilated(
        x, p["w"],
        window_strides=stride,
        padding=tuple((pp, pp) for pp in padding),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + p["b"]


# ---------------------------------------------------------------------------
# conv_transpose2d (NHWC)
# ---------------------------------------------------------------------------

def conv_transpose2d_init(key, in_ch: int, out_ch: int, k: int) -> Params:
    return {
        "w": normal_init(key, (k, k, in_ch, out_ch)),
        "b": jnp.zeros((out_ch,), jnp.float32),
    }


def conv2d_raw(w: jnp.ndarray, x: jnp.ndarray, stride: int = 1,
               padding: int = 0) -> jnp.ndarray:
    """Bias-free Conv2d on an explicit kernel slice — the plain-conv
    counterpart of conv_transpose2d_raw for splitting a conv over a
    channel-concat input by linearity (vgg decoder groups)."""
    return lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_transpose2d_raw(w: jnp.ndarray, x: jnp.ndarray, stride: int,
                         torch_padding: int) -> jnp.ndarray:
    """Bias-free torch-style ConvTranspose2d. Used by the grouped decoder to
    split one transposed conv over a channel-concat input into its d-/skip-
    half contributions by linearity:
    convT(cat(d, s), W) = convT(d, W[:, :, :c_d]) + convT(s, W[:, :, c_d:]).
    Output stays in x's dtype (a widened preferred_element_type would make
    the conv transpose rule mix dtypes under AD in bf16), so in bf16 each
    half rounds once on output before the sum — the same order of rounding
    the fused conv applies to its single output."""
    pad = w.shape[0] - 1 - torch_padding
    return lax.conv_transpose(
        x, w,
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def broadcast_add(y: jnp.ndarray, pre: jnp.ndarray) -> jnp.ndarray:
    """y (N·b0, h, w, c) + pre (b0, h, w, c) where N·b0 may be a merged
    sample·batch axis: broadcast over the leading sample factor.

    Equal leading axes take the plain `y + pre` path (fuses into the
    producing conv's output fusion — every hoisted-decode caller except the
    merged-batch eval scan is shape-equal). The unequal path's 5-D
    reshape-broadcast is CORRECT but measured SLOWER than pre-tiling on TPU
    (19.3 vs 10.0 ms/step in the rollout decoder, PERF.md r5: the reshape
    breaks the convT output fusion) — hot loops should tile `pre` to the
    merged batch ONCE outside the scan (generate/rollout.py does), leaving
    this branch as the correctness fallback."""
    if y.shape[0] == pre.shape[0]:
        return y + pre
    n, rem = divmod(y.shape[0], pre.shape[0])
    if rem:
        raise ValueError(
            f"broadcast_add: leading axis {y.shape[0]} is not a multiple of "
            f"the precomputed batch {pre.shape[0]}")
    return (y.reshape((n,) + pre.shape) + pre[None]).reshape(y.shape)


def conv_transpose2d_apply(p: Params, x: jnp.ndarray, stride: int,
                           torch_padding: int) -> jnp.ndarray:
    """Torch-style ConvTranspose2d(k, stride, padding).

    Output size (in-1)*stride - 2*torch_padding + k, realized with
    lax.conv_transpose explicit padding lo = hi = k - 1 - torch_padding.
    The two shapes used by the model family:
      k=4, s=2, p=1 → exact 2x upsample (dcgan_64.py:20)
      k=4, s=1, p=0 → 1x1 → 4x4 head     (dcgan_64.py:62)
    """
    pad = p["w"].shape[0] - 1 - torch_padding
    y = lax.conv_transpose(
        x, p["w"],
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"]


# ---------------------------------------------------------------------------
# batch norm (torch semantics: eps=1e-5, momentum=0.1,
#             biased var to normalize, unbiased var into running stats)
# ---------------------------------------------------------------------------

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


def batchnorm_init(key, ch: int) -> Params:
    return {
        "scale": normal_init(key, (ch,), std=WEIGHT_STD, mean=1.0),
        "bias": jnp.zeros((ch,), jnp.float32),
    }


def batchnorm_stats_init(ch: int) -> Params:
    return {"mean": jnp.zeros((ch,), jnp.float32),
            "var": jnp.ones((ch,), jnp.float32)}


def batchnorm_apply(p: Params, stats: Params, x: jnp.ndarray, train: bool,
                    momentum: float = BN_MOMENTUM,
                    eps: float = BN_EPS,
                    axis_name: str = None) -> Tuple[jnp.ndarray, Params]:
    """Normalize over all axes but the last (channel). Returns (y, new_stats).

    Under shard_map data parallelism, pass `axis_name` to compute the batch
    statistics over the GLOBAL batch (cross-chip pmean) — exact single-chip
    semantics at any device count."""
    at = acc_type(x.dtype)
    if train:
        # batch statistics always accumulate in f32 (bf16 means/variances
        # drift the running stats); normalization output keeps x's dtype
        x32 = x.astype(at)
        axes = tuple(range(x.ndim - 1))
        n = x.size // x.shape[-1]
        if axis_name is not None:
            # two-pass (global mean, then global E[(x-μ)²]) — numerically
            # identical algorithm to the single-device jnp.var path; the
            # one-pass E[x²]-μ² form loses ~3 digits to cancellation and
            # visibly shifts downstream training numerics
            mean = lax.pmean(jnp.mean(x32, axis=axes), axis_name)
            var = lax.pmean(jnp.mean((x32 - mean) ** 2, axis=axes), axis_name)
            n = n * lax.psum(1, axis_name)
            unbiased = var * (n / jnp.maximum(n - 1, 1))
        else:
            mean = jnp.mean(x32, axis=axes)
            var = jnp.var(x32, axis=axes)
            unbiased = var * (n / max(n - 1, 1))
        new_stats = {
            "mean": (1 - momentum) * stats["mean"] + momentum * mean,
            "var": (1 - momentum) * stats["var"] + momentum * unbiased,
        }
    else:
        mean, var = stats["mean"], stats["var"]
        new_stats = stats
    inv = lax.rsqrt(var.astype(at) + eps)
    y = ((x - mean) * (inv * p["scale"].astype(at))
         + p["bias"].astype(at)).astype(x.dtype)
    return y, new_stats


# ---------------------------------------------------------------------------
# activations / pooling / resize
# ---------------------------------------------------------------------------

def leaky_relu(x, negative_slope=0.2):
    # max(x, αx) == where(x>=0, x, αx) for 0 <= α <= 1, and compiles to a
    # single fusible max instead of compare+select
    return jnp.maximum(x, negative_slope * x)


def max_pool2d(x: jnp.ndarray, k: int = 2, stride: int = 2) -> jnp.ndarray:
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


def max_pool3d(x: jnp.ndarray, k: Tuple[int, int, int]) -> jnp.ndarray:
    kd, kh, kw = k
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, kd, kh, kw, 1),
        window_strides=(1, kd, kh, kw, 1),
        padding="VALID",
    )


def upsample_nearest2d(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample (reference vgg_64.py:94 UpsamplingNearest2d)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, scale, w, scale, c))
    return x.reshape(b, h * scale, w * scale, c)


# ---------------------------------------------------------------------------
# composite blocks shared by the backbones
# ---------------------------------------------------------------------------

def conv_block_init(key, in_ch, out_ch, k):
    """conv + BN (+ activation applied by caller)."""
    k1, k2 = jax.random.split(key)
    return {
        "conv": conv2d_init(k1, in_ch, out_ch, k),
        "bn": batchnorm_init(k2, out_ch),
    }


def conv_block_stats_init(out_ch):
    return {"bn": batchnorm_stats_init(out_ch)}


def conv_block_apply(p, stats, x, train, *, stride, padding, act,
                     axis_name=None):
    y = conv2d_apply(p["conv"], x, stride=stride, padding=padding)
    if "bn" not in p:          # BN folded into the conv (fold_conv_bn)
        return act(y), stats
    y, new_bn = batchnorm_apply(p["bn"], stats["bn"], y, train,
                                axis_name=axis_name)
    return act(y), {"bn": new_bn}


def upconv_block_init(key, in_ch, out_ch, k):
    k1, k2 = jax.random.split(key)
    return {
        "conv": conv_transpose2d_init(k1, in_ch, out_ch, k),
        "bn": batchnorm_init(k2, out_ch),
    }


def upconv_block_apply(p, stats, x, train, *, stride, torch_padding, act,
                       axis_name=None):
    y = conv_transpose2d_apply(p["conv"], x, stride=stride,
                               torch_padding=torch_padding)
    if "bn" not in p:          # BN folded into the conv (fold_conv_bn)
        return act(y), stats
    y, new_bn = batchnorm_apply(p["bn"], stats["bn"], y, train,
                                axis_name=axis_name)
    return act(y), {"bn": new_bn}


def fold_conv_bn(block_p, block_stats, eps: float = BN_EPS):
    """Fold an eval-mode BatchNorm into the preceding conv (plain or
    transposed — both store HWIO with the output channel last).

    Eval BN is the affine y ↦ (y − μ)·γ/√(σ²+ε) + β, so
      w' = w · f,   b' = (b − μ)·f + β,   f = γ/√(σ²+ε).
    Returns a block with NO "bn" key — conv_block_apply/upconv_block_apply
    then skip the separate normalize, removing one full elementwise
    multiply-add pass over every activation map (XLA:TPU does not fuse the
    BN affine into the conv itself)."""
    f = (block_p["bn"]["scale"].astype(jnp.float32)
         * lax.rsqrt(block_stats["bn"]["var"].astype(jnp.float32) + eps))
    w = block_p["conv"]["w"].astype(jnp.float32) * f
    b = ((block_p["conv"]["b"].astype(jnp.float32)
          - block_stats["bn"]["mean"].astype(jnp.float32)) * f
         + block_p["bn"]["bias"].astype(jnp.float32))
    return {"conv": {"w": w.astype(block_p["conv"]["w"].dtype),
                     "b": b.astype(block_p["conv"]["b"].dtype)}}
