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
  * `ssim` follows skimage's compare_ssim defaults for floats as the
    reference calls it (gaussian_weights=False): uniform 7x7 window, uniform
    (not Gaussian) local statistics, data_range = max-min OF EACH gt/pred
    pair as skimage infers it... skimage actually requires data_range for
    floats in modern versions; the 0.x versions the reference ran against
    defaulted to data_range = img.max() - img.min() of the FIRST image. We
    follow that: data_range = gt.max() - gt.min() per image (documented
    deviation: computed per-pair on gt only).
  * `finn_ssim` uses 'valid' convolution like scipy fftconvolve(mode='valid')
    and L=1, K1=0.01, K2=0.03 (utils.py:278-283).
All functions take single-channel 2-D images and are designed to be composed
with vmap; `eval_seq` / `finn_eval_seq` wrappers reproduce the reference's
(B, T) channel-averaged outputs.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# windows
# ---------------------------------------------------------------------------

def _uniform_window(size: int = 7) -> jnp.ndarray:
    return jnp.full((size, size), 1.0 / (size * size), jnp.float32)


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """fspecial_gauss of utils.py:270-273."""
    half = size // 2
    coords = jnp.arange(-half + 1, half + 1, dtype=jnp.float32)
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

def ssim(gt: jnp.ndarray, pred: jnp.ndarray, win_size: int = 7) -> jnp.ndarray:
    """skimage compare_ssim semantics (uniform window, sample covariances).

    skimage uses unbiased local variance (cov_norm = N/(N-1)) and
    C1=(0.01*L)^2, C2=(0.03*L)^2 with L = data_range.
    """
    gt = gt.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
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


def psnr(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """skimage compare_psnr with data_range inferred from gt (dtype float →
    range taken as gt.max()-gt.min() in 0.x; modern uses 1.0 for unit floats;
    the reference data is in [0,1] so use data_range=1)."""
    mse = jnp.mean((gt.astype(jnp.float32) - pred.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))


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


def finn_eval_seq(gt, pred) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """utils.py:237-263 equivalent, fully on device."""
    return (_per_frame(mse_metric, gt, pred),
            _per_frame(finn_ssim, gt, pred),
            _per_frame(finn_psnr, gt, pred))
