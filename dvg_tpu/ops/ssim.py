"""On-device SSIM / PSNR / MSE — pure jnp, vmappable over batch×sample×time.

Replaces the reference's CPU metric loops:
  * utils.py:220-234 `eval_seq`  — skimage compare_ssim / compare_psnr per
    (batch, frame, channel), triple Python loop on host. Here the same math
    runs as one fused XLA program over the whole (B, S, T) grid.
  * utils.py:237-301 `finn_eval_seq` / `finn_ssim` / `finn_psnr` — the
    Babaeizadeh/Finn-style FFT-convolution SSIM with 11x11 sigma=1.5
    Gaussian window and log10 PSNR.
  * utils.py:215-218 `mse_metric`.

Numerics notes:
  * `ssim`/`psnr` follow skimage's compare_ssim / compare_psnr defaults for
    floats as the reference calls them (no data_range argument,
    gaussian_weights=False): uniform 7x7 window, uniform (not Gaussian)
    local statistics, and data_range = dtype_range span. skimage ≤0.17
    (where `skimage.measure.compare_*` existed) resolves a float image's
    dtype_range to (-1, 1) → **data_range = 2.0**, for BOTH compare_ssim's
    C1/C2 and compare_psnr's 10·log10(dr²/mse). All skimage-parity paths
    here use that constant (override via the `data_range` argument;
    `data_range=None` selects the per-image gt max-min span instead).
  * `finn_ssim` uses 'valid' convolution like scipy fftconvolve(mode='valid')
    and L=1, K1=0.01, K2=0.03 (utils.py:278-283); `finn_psnr` is the
    explicit 10·log10(1/mse) of utils.py:266-268 — NOT data_range-scaled.
All functions take single-channel 2-D images and are designed to be composed
with vmap; `eval_seq` / `finn_eval_seq` wrappers reproduce the reference's
(B, T) channel-averaged outputs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

# skimage ≤0.17 compare_ssim/compare_psnr default for float images:
# dtype_range[float] = (-1, 1) → data_range = 2.0 (see module docstring).
DATA_RANGE = 2.0


# ---------------------------------------------------------------------------
# windows
# ---------------------------------------------------------------------------

def _uniform_window(size: int = 7) -> jnp.ndarray:
    return jnp.full((size, size), 1.0 / (size * size), jnp.float32)


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """fspecial_gauss of utils.py:270-273: mgrid[-size//2+1 : size//2+1]
    with Python floor division (-11//2 = -6) gives the symmetric taps
    -(size//2)..size//2 — a true size×size window."""
    half = size // 2
    coords = jnp.arange(-half, half + 1, dtype=jnp.float32)
    x = coords[None, :]
    y = coords[:, None]
    g = jnp.exp(-((x ** 2 + y ** 2) / (2.0 * sigma ** 2)))
    return g / jnp.sum(g)


def _filter2d_valid(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """2-D VALID cross-correlation of a single 2-D image with a window."""
    return lax.conv_general_dilated(
        img[None, :, :, None], window[:, :, None, None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]


# ---------------------------------------------------------------------------
# per-image metrics (2-D single channel)
# ---------------------------------------------------------------------------

def ssim(gt: jnp.ndarray, pred: jnp.ndarray, win_size: int = 7,
         data_range: float | None = DATA_RANGE) -> jnp.ndarray:
    """skimage compare_ssim semantics (uniform window, sample covariances).

    skimage uses unbiased local variance (cov_norm = N/(N-1)) and
    C1=(0.01*L)^2, C2=(0.03*L)^2 with L = data_range (2.0 by default, the
    ≤0.17 float dtype_range; None → per-image gt span).
    """
    gt = gt.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    if data_range is None:
        data_range = jnp.maximum(jnp.max(gt) - jnp.min(gt), 1e-6)
    w = _uniform_window(win_size)
    n = win_size * win_size
    cov_norm = n / (n - 1.0)

    ux = _filter2d_valid(gt, w)
    uy = _filter2d_valid(pred, w)
    uxx = _filter2d_valid(gt * gt, w)
    uyy = _filter2d_valid(pred * pred, w)
    uxy = _filter2d_valid(gt * pred, w)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux ** 2 + uy ** 2 + c1
    b2 = vx + vy + c2
    return jnp.mean((a1 * a2) / (b1 * b2))


def psnr(gt: jnp.ndarray, pred: jnp.ndarray,
         data_range: float = DATA_RANGE) -> jnp.ndarray:
    """skimage ≤0.17 compare_psnr without a data_range argument:
    10·log10(dtype_range²/mse) with dtype_range = 2.0 for floats."""
    mse = jnp.mean((gt.astype(jnp.float32) - pred.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def finn_ssim(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """utils.py:275-301: Gaussian 11x11 sigma=1.5 window, biased covariances,
    L=1. Returns the mean over the valid map (utils.py:249 `.mean()`)."""
    img1 = gt.astype(jnp.float32)
    img2 = pred.astype(jnp.float32)
    w = _gaussian_window(11, 1.5)
    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    mu1 = _filter2d_valid(img1, w)
    mu2 = _filter2d_valid(img2, w)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filter2d_valid(img1 * img1, w) - mu1_sq
    s2 = _filter2d_valid(img2 * img2, w) - mu2_sq
    s12 = _filter2d_valid(img1 * img2, w) - mu1_mu2
    m = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1)
                                                 * (s1 + s2 + c2))
    return jnp.mean(m)


def finn_psnr(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """utils.py:266-268: 10*log10(1/mse)."""
    mse = jnp.mean((gt.astype(jnp.float32) - pred.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))


def mse_metric(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """utils.py:215-218: sum sq error / (C*H*W) for a CHW image — i.e. the
    per-pixel mean over a full frame."""
    return jnp.mean((gt - pred) ** 2) * 1.0


# ---------------------------------------------------------------------------
# batched NHWC fast path (the generation hot loop's metric)
# ---------------------------------------------------------------------------

def _box_filter_sep(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Separable depthwise VALID box filter on (B, H, W, C): two 1-D convs
    with feature_group_count=C — 2·size MACs/pixel instead of size², one
    fused pass over the whole metric stack."""
    c = x.shape[-1]
    kh = jnp.full((size, 1, 1, c), 1.0 / size, x.dtype)
    kw = jnp.full((1, size, 1, c), 1.0 / size, x.dtype)
    dn = ("NHWC", "HWIO", "NHWC")
    y = lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                 dimension_numbers=dn, feature_group_count=c)
    return lax.conv_general_dilated(y, kw, (1, 1), "VALID",
                                    dimension_numbers=dn,
                                    feature_group_count=c)


def ssim_gt_precompute(gt: jnp.ndarray, win_size: int = 7):
    """Precompute the ground-truth-side SSIM quantities for (B, H, W, C)
    frames: the windowed mean and second moment. The fixed DATA_RANGE=2.0
    convention applies (skimage ≤0.17 float images) — there is no
    per-image data_range mode on this batched path; use the scalar
    `ssim(..., data_range=None)` for that.

    In a diverse-generation sweep the SAME ground truth scores S sampled
    futures — computing these once instead of per sample removes ~all
    gt-side work from the hot loop."""
    gt = gt.astype(jnp.float32)
    m = _box_filter_sep(jnp.concatenate([gt, gt * gt], axis=-1), win_size)
    c = gt.shape[-1]
    return {"ux": m[..., :c], "uxx": m[..., c:], "gt": gt}


def ssim_psnr_batch_pre(pre, pred: jnp.ndarray,
                        win_size: int = 7) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`ssim_psnr_batch` with the gt side precomputed (`ssim_gt_precompute`).
    Per sample, only the pred-dependent moments [pred, pred², gt·pred]
    are filtered — a 3C-channel pass instead of 5C plus reductions."""
    gt, ux, uxx = pre["gt"], pre["ux"], pre["uxx"]
    pred = pred.astype(jnp.float32)
    c = gt.shape[-1]
    m = _box_filter_sep(
        jnp.concatenate([pred, pred * pred, gt * pred], axis=-1), win_size)
    uy, uyy, uxy = (m[..., i * c:(i + 1) * c] for i in range(3))
    n = win_size * win_size
    cov_norm = n / (n - 1.0)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (0.01 * DATA_RANGE) ** 2
    c2 = (0.03 * DATA_RANGE) ** 2
    s_map = ((2.0 * ux * uy + c1) * (2.0 * vxy + c2)
             / ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2)))
    ssim_b = jnp.mean(s_map, axis=(1, 2, 3))
    mse_bc = jnp.mean((gt - pred) ** 2, axis=(1, 2))
    psnr_b = jnp.mean(
        10.0 * jnp.log10(DATA_RANGE ** 2 / jnp.maximum(mse_bc, 1e-12)),
        axis=-1)
    return ssim_b, psnr_b


def _gauss_filter_sep(x: jnp.ndarray, size: int = 11,
                      sigma: float = 1.5) -> jnp.ndarray:
    """Separable depthwise VALID Gaussian filter on (B, H, W, C) — the
    Finn-style window (utils.py:270-273) as two 1-D convs."""
    c = x.shape[-1]
    half = size // 2
    coords = jnp.arange(-half, half + 1, dtype=jnp.float32)
    g1 = jnp.exp(-(coords ** 2) / (2.0 * sigma ** 2))
    g1 = g1 / jnp.sum(g1)
    k = g1.shape[0]
    kh = jnp.broadcast_to(g1[:, None, None, None], (k, 1, 1, c))
    kw = jnp.broadcast_to(g1[None, :, None, None], (1, k, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    y = lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                 dimension_numbers=dn, feature_group_count=c)
    return lax.conv_general_dilated(y, kw, (1, 1), "VALID",
                                    dimension_numbers=dn,
                                    feature_group_count=c)


def finn_ssim_psnr_batch(gt: jnp.ndarray, pred: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched Finn-variant metrics for NHWC frames → ((B,), (B,)):
    11x11 sigma=1.5 Gaussian window, biased covariances, L=1
    (reference finn_ssim/finn_psnr, utils.py:266-301), channel-averaged."""
    gt = gt.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    c = gt.shape[-1]
    stack = jnp.concatenate([gt, pred, gt * gt, pred * pred, gt * pred],
                            axis=-1)
    m = _gauss_filter_sep(stack)
    mu1, mu2, s11, s22, s12 = (m[..., i * c:(i + 1) * c] for i in range(5))
    v1 = s11 - mu1 * mu1
    v2 = s22 - mu2 * mu2
    v12 = s12 - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    s_map = ((2 * mu1 * mu2 + c1) * (2 * v12 + c2)
             / ((mu1 * mu1 + mu2 * mu2 + c1) * (v1 + v2 + c2)))
    # reference finn_eval_seq substitutes -1 for a NaN per-channel SSIM
    # (utils.py:247-248) before channel-averaging — reproduce, so a
    # diverged model's scores stay finite and -1-penalized, not NaN
    ssim_bc = jnp.mean(s_map, axis=(1, 2))                # (B, C)
    ssim_bc = jnp.where(jnp.isnan(ssim_bc), -1.0, ssim_bc)
    ssim_b = jnp.mean(ssim_bc, axis=-1)
    mse_bc = jnp.mean((gt - pred) ** 2, axis=(1, 2))
    psnr_b = jnp.mean(10.0 * jnp.log10(1.0 / jnp.maximum(mse_bc, 1e-12)),
                      axis=-1)
    return ssim_b, psnr_b


def ssim_psnr_batch(gt: jnp.ndarray, pred: jnp.ndarray,
                    win_size: int = 7) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Channel-averaged SSIM + PSNR for a batch of NHWC frames → ((B,), (B,)).

    Same math as `ssim`/`psnr` (skimage compare_ssim semantics: uniform
    window, unbiased covariances, data_range = 2.0), but all
    five windowed moments of the whole batch run as ONE separable depthwise
    conv stack — this is the in-rollout eval path, ~50% of generation time
    when done image-at-a-time."""
    gt = gt.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    b, h, w, c = gt.shape
    stack = jnp.concatenate([gt, pred, gt * gt, pred * pred, gt * pred],
                            axis=-1)                      # (B, H, W, 5C)
    m = _box_filter_sep(stack, win_size)
    ux, uy, uxx, uyy, uxy = (m[..., i * c:(i + 1) * c] for i in range(5))
    n = win_size * win_size
    cov_norm = n / (n - 1.0)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (0.01 * DATA_RANGE) ** 2
    c2 = (0.03 * DATA_RANGE) ** 2
    s_map = ((2.0 * ux * uy + c1) * (2.0 * vxy + c2)
             / ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2)))
    ssim_b = jnp.mean(s_map, axis=(1, 2, 3))

    mse_bc = jnp.mean((gt - pred) ** 2, axis=(1, 2))      # (B, C)
    psnr_b = jnp.mean(
        10.0 * jnp.log10(DATA_RANGE ** 2 / jnp.maximum(mse_bc, 1e-12)),
        axis=-1)
    return ssim_b, psnr_b


# ---------------------------------------------------------------------------
# sequence evals (reference eval_seq / finn_eval_seq output contract)
# ---------------------------------------------------------------------------

def _per_frame(metric, gt, pred):
    """gt/pred: (T, B, H, W, C) → (B, T) channel-averaged metric."""
    def one(g, p):  # (H, W, C)
        vals = jax.vmap(metric, in_axes=(2, 2))(g, p)
        return jnp.mean(vals)
    per = jax.vmap(jax.vmap(one))(gt, pred)   # (T, B)
    return jnp.swapaxes(per, 0, 1)


def eval_seq(gt, pred) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(T,B,H,W,C) sequences → (mse, ssim, psnr) each (B, T).
    Matches utils.py:220-234 (mse returned as zeros there; here real MSE)."""
    return (_per_frame(mse_metric, gt, pred),
            _per_frame(ssim, gt, pred),
            _per_frame(psnr, gt, pred))


def _finn_ssim_nan_neg1(g, p):
    """finn_ssim with the reference's NaN→-1 substitution: finn_eval_seq
    records ssim = -1 for a (frame, channel) whose SSIM is NaN
    (utils.py:247-248) so best-sample argmax stays well-defined."""
    v = finn_ssim(g, p)
    return jnp.where(jnp.isnan(v), -1.0, v)


def finn_eval_seq(gt, pred) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """utils.py:237-263 equivalent, fully on device (incl. the NaN→-1
    per-channel SSIM substitution of utils.py:247-248)."""
    return (_per_frame(mse_metric, gt, pred),
            _per_frame(_finn_ssim_nan_neg1, gt, pred),
            _per_frame(finn_psnr, gt, pred))
