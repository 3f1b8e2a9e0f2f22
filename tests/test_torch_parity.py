"""Numerical parity of the hand-rolled layers against torch primitives.

The reference is PyTorch; these tests pin our cell/conv/BN math to the torch
ops the reference's modules are built from (torch CPU is available in the
image). This is the behavioral-parity backbone for SURVEY.md §2.3-7 without
copying any reference code."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dvg_tpu.models import layers as L
from dvg_tpu.models import rnn as R

torch = pytest.importorskip("torch")


def test_lstm_cell_matches_torch():
    in_dim, hidden, b = 6, 10, 4
    rng = np.random.RandomState(0)
    p = {
        "w_ih": rng.randn(in_dim, 4 * hidden).astype(np.float32) * 0.2,
        "w_hh": rng.randn(hidden, 4 * hidden).astype(np.float32) * 0.2,
        "b_ih": rng.randn(4 * hidden).astype(np.float32) * 0.1,
        "b_hh": rng.randn(4 * hidden).astype(np.float32) * 0.1,
    }
    cell = torch.nn.LSTMCell(in_dim, hidden)
    with torch.no_grad():
        cell.weight_ih.copy_(torch.tensor(p["w_ih"].T))
        cell.weight_hh.copy_(torch.tensor(p["w_hh"].T))
        cell.bias_ih.copy_(torch.tensor(p["b_ih"]))
        cell.bias_hh.copy_(torch.tensor(p["b_hh"]))
    x = rng.randn(b, in_dim).astype(np.float32)
    h0 = rng.randn(b, hidden).astype(np.float32)
    c0 = rng.randn(b, hidden).astype(np.float32)

    out, (h1, c1) = R.lstm_cell_apply(
        jax.tree.map(jnp.asarray, p), jnp.asarray(x),
        (jnp.asarray(h0), jnp.asarray(c0)))
    with torch.no_grad():
        th, tc = cell(torch.tensor(x), (torch.tensor(h0), torch.tensor(c0)))
    np.testing.assert_allclose(np.asarray(h1), th.numpy(), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), tc.numpy(), rtol=1e-5,
                               atol=1e-5)


def test_gru_cell_matches_torch():
    in_dim, hidden, b = 5, 7, 3
    rng = np.random.RandomState(1)
    p = {
        "w_ih": rng.randn(in_dim, 3 * hidden).astype(np.float32) * 0.2,
        "w_hh": rng.randn(hidden, 3 * hidden).astype(np.float32) * 0.2,
        "b_ih": rng.randn(3 * hidden).astype(np.float32) * 0.1,
        "b_hh": rng.randn(3 * hidden).astype(np.float32) * 0.1,
    }
    cell = torch.nn.GRUCell(in_dim, hidden)
    with torch.no_grad():
        cell.weight_ih.copy_(torch.tensor(p["w_ih"].T))
        cell.weight_hh.copy_(torch.tensor(p["w_hh"].T))
        cell.bias_ih.copy_(torch.tensor(p["b_ih"]))
        cell.bias_hh.copy_(torch.tensor(p["b_hh"]))
    x = rng.randn(b, in_dim).astype(np.float32)
    h0 = rng.randn(b, hidden).astype(np.float32)
    out, h1 = R.gru_cell_apply(jax.tree.map(jnp.asarray, p), jnp.asarray(x),
                               jnp.asarray(h0))
    with torch.no_grad():
        th = cell(torch.tensor(x), torch.tensor(h0))
    np.testing.assert_allclose(np.asarray(h1), th.numpy(), rtol=1e-5,
                               atol=1e-5)


def test_conv2d_matches_torch():
    rng = np.random.RandomState(2)
    w = rng.randn(4, 4, 3, 8).astype(np.float32) * 0.1     # HWIO
    bias = rng.randn(8).astype(np.float32) * 0.1
    x = rng.randn(2, 16, 16, 3).astype(np.float32)          # NHWC
    y = L.conv2d_apply({"w": jnp.asarray(w), "b": jnp.asarray(bias)},
                       jnp.asarray(x), stride=2, padding=1)
    conv = torch.nn.Conv2d(3, 8, 4, 2, 1)
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(w.transpose(3, 2, 0, 1)))  # OIHW
        conv.bias.copy_(torch.tensor(bias))
        ty = conv(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(y),
                               ty.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)


def test_conv_transpose2d_matches_torch():
    rng = np.random.RandomState(3)
    w = rng.randn(4, 4, 6, 3).astype(np.float32) * 0.1     # HW, in, out
    bias = rng.randn(3).astype(np.float32) * 0.1
    x = rng.randn(2, 8, 8, 6).astype(np.float32)
    y = L.conv_transpose2d_apply({"w": jnp.asarray(w), "b": jnp.asarray(bias)},
                                 jnp.asarray(x), stride=2, torch_padding=1)
    tconv = torch.nn.ConvTranspose2d(6, 3, 4, 2, 1)
    with torch.no_grad():
        # torch ConvTranspose2d weight is (in, out, H, W), spatially flipped
        # relative to lax.conv_transpose's HWIO correlation convention
        tconv.weight.copy_(torch.tensor(
            w[::-1, ::-1].transpose(2, 3, 0, 1).copy()))
        tconv.bias.copy_(torch.tensor(bias))
        ty = tconv(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(y),
                               ty.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)


def test_batchnorm_matches_torch():
    rng = np.random.RandomState(4)
    ch = 5
    x = rng.randn(4, 6, 6, ch).astype(np.float32)
    scale = rng.rand(ch).astype(np.float32) + 0.5
    bias = rng.randn(ch).astype(np.float32) * 0.1
    p = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}
    stats = L.batchnorm_stats_init(ch)

    bn = torch.nn.BatchNorm2d(ch)
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(scale))
        bn.bias.copy_(torch.tensor(bias))
    tx = torch.tensor(x.transpose(0, 3, 1, 2))

    # train mode: batch stats normalize, running stats EMA with unbiased var
    y, new_stats = L.batchnorm_apply(p, stats, jnp.asarray(x), train=True)
    bn.train()
    ty = bn(tx)
    np.testing.assert_allclose(np.asarray(y),
                               ty.detach().numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_stats["mean"]),
                               bn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_stats["var"]),
                               bn.running_var.numpy(), rtol=1e-4, atol=1e-5)

    # eval mode: running stats normalize
    y2, _ = L.batchnorm_apply(p, new_stats, jnp.asarray(x), train=False)
    bn.eval()
    ty2 = bn(tx)
    np.testing.assert_allclose(np.asarray(y2),
                               ty2.detach().numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)
