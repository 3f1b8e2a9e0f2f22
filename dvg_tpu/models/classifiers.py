"""Action classifiers (vestigial in the reference; shipped for parity).

Parity with /root/reference/models/cnn_block_frame.py:3-85 (CNNBlockFrame /
CNNBlockFrame3: 3-D conv video classifiers, 6-way) and
/root/reference/models/linear_layer.py:9-48 (MLP: 90→50→6, MLP2: 10→6→6).
These are imported nowhere in the reference drivers; they exist for
action-class evaluation of the latent space.

Video input here is NDHWC (batch, frames, H, W, C) — the reference's NCDHW
transposed to the TPU-native channel-last layout.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from dvg_tpu.models import layers as L


def _relu(x):
    return jnp.maximum(x, 0.0)


# ---------------------------------------------------------------------------
# CNNBlockFrame / CNNBlockFrame3 (cnn_block_frame.py:3-43 / 45-85)
# ---------------------------------------------------------------------------

def cnn_block_frame_init(key, in_channels: int = 1, num_classes: int = 6) -> Dict:
    k = jax.random.split(key, 8)
    return {
        "conv1": L.conv3d_init(k[0], in_channels, 16, (4, 5, 5)),
        "bn1": L.batchnorm_init(k[1], 16),
        "conv2": L.conv3d_init(k[2], 16, 32, (4, 3, 3)),
        "bn2": L.batchnorm_init(k[3], 32),
        "conv3": L.conv3d_init(k[4], 32, 64, (3, 3, 3)),
        "bn3": L.batchnorm_init(k[5], 64),
        "fc1": L.linear_init(k[6], 2304, 128),
        "fc2": L.linear_init(k[7], 128, num_classes),
    }


def cnn_block_frame_stats_init() -> Dict:
    return {"bn1": L.batchnorm_stats_init(16),
            "bn2": L.batchnorm_stats_init(32),
            "bn3": L.batchnorm_stats_init(64)}


def cnn_block_frame_apply(params, stats, x, train: bool, rng=None,
                          dropout_rate: float = 0.5):
    """x: (B, D, H, W, C) video → logits (B, num_classes)."""
    def drop(y, key):
        if not train or rng is None:
            return y
        keep = jax.random.bernoulli(key, 1.0 - dropout_rate, y.shape)
        return jnp.where(keep, y / (1.0 - dropout_rate), 0.0)

    rngs = jax.random.split(rng, 4) if rng is not None else [None] * 4
    new_stats = {}
    h = L.conv3d_apply(params["conv1"], x)
    h, new_stats["bn1"] = L.batchnorm_apply(params["bn1"], stats["bn1"], h, train)
    h = L.max_pool3d(_relu(h), (1, 2, 2))
    h = drop(h, rngs[0])
    h = L.conv3d_apply(params["conv2"], h)
    h, new_stats["bn2"] = L.batchnorm_apply(params["bn2"], stats["bn2"], h, train)
    h = L.max_pool3d(_relu(h), (2, 2, 2))
    h = drop(h, rngs[1])
    h = L.conv3d_apply(params["conv3"], h)
    h, new_stats["bn3"] = L.batchnorm_apply(params["bn3"], stats["bn3"], h, train)
    h = L.max_pool3d(_relu(h), (2, 2, 2))
    h = drop(h, rngs[2])
    h = h.reshape(h.shape[0], -1)
    h = _relu(L.linear_apply(params["fc1"], h))
    h = drop(h, rngs[3])
    return L.linear_apply(params["fc2"], h), new_stats


# ---------------------------------------------------------------------------
# MLP / MLP2 latent classifiers (linear_layer.py:9-48)
# ---------------------------------------------------------------------------

def mlp_init(key, in_dim: int = 90, hidden: int = 50, num_classes: int = 6) -> Dict:
    k1, k2 = jax.random.split(key)
    return {"fc1": L.linear_init(k1, in_dim, hidden),
            "fc2": L.linear_init(k2, hidden, num_classes)}


def mlp_apply(params, x):
    return L.linear_apply(params["fc2"], _relu(L.linear_apply(params["fc1"], x)))
