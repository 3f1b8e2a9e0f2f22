"""Pallas fused SSIM kernel vs the XLA reference path (interpret mode on
the CPU test backend; the compiled path is exercised by bench.py on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dvg_tpu.ops.pallas_ssim import ssim_psnr_batch_pallas
from dvg_tpu.ops.ssim import ssim_psnr_batch


@pytest.mark.parametrize("shape", [(5, 64, 64, 3), (4, 64, 64, 1)])
def test_matches_xla_path(shape):
    rng = np.random.RandomState(0)
    gt = jnp.asarray(rng.rand(*shape).astype(np.float32))
    pred = jnp.asarray(
        (rng.rand(*shape) * 0.3 + np.asarray(gt) * 0.7).astype(np.float32))
    s_ref, q_ref = ssim_psnr_batch(gt, pred)
    s, q, m = ssim_psnr_batch_pallas(gt, pred, interpret=True)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=5e-4)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q_ref), atol=1e-3)
    m_ref = np.mean((np.asarray(gt) - np.asarray(pred)) ** 2, axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(m), m_ref, rtol=1e-5)


def test_identical_images():
    x = jnp.asarray(np.random.RandomState(1).rand(8, 64, 64, 1)
                    .astype(np.float32))
    s, q, m = ssim_psnr_batch_pallas(x, x, interpret=True)
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-4)
    assert np.all(np.asarray(q) > 100.0)   # mse floor → huge PSNR
    np.testing.assert_allclose(np.asarray(m), 0.0, atol=1e-12)


def test_cyclic_gt_layout():
    """The cyclic-gt variant (diverse-sample layout: pred row p vs gt row
    p % B) matches the tiled pairwise reference."""
    from dvg_tpu.ops.pallas_ssim import ssim_psnr_batch_pallas_cyclic
    rng = np.random.RandomState(2)
    b, s = 5, 3
    gt = jnp.asarray(rng.rand(b, 64, 64, 3).astype(np.float32))
    pred = jnp.asarray(rng.rand(s * b, 64, 64, 3).astype(np.float32))
    sv, qv, mv = ssim_psnr_batch_pallas_cyclic(gt, pred, interpret=True)
    s_ref, q_ref = ssim_psnr_batch(jnp.tile(gt, (s, 1, 1, 1)), pred)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(s_ref), atol=5e-4)
    np.testing.assert_allclose(np.asarray(qv), np.asarray(q_ref), atol=1e-3)
    m_ref = np.mean((np.tile(np.asarray(gt), (s, 1, 1, 1))
                     - np.asarray(pred)) ** 2, axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(mv), m_ref, rtol=1e-5)
