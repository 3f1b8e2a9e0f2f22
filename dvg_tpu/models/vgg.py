"""VGG-style encoder/decoder backbones (64px and 128px variants).

Behavioral parity with /root/reference/models/vgg_64.py and vgg_128.py:
  * encoder: per-resolution groups of 3x3 conv+BN+LeakyReLU(0.2) layers with
    2x2 max-pool between groups; a 4x4 VALID conv+BN+Tanh head collapses the
    final 4x4 map to the g_dim vector. Skips are the PRE-POOL group outputs
    (vgg_64.py:51-56), i.e. skip[0] is at full input resolution.
  * decoder: ConvTranspose 1x1 → 4x4 head, then nearest-neighbor 2x upsample
    followed by a conv group consuming concat([up, skip]) (vgg_64.py:97-105);
    final layer is a 3x3 same-size ConvTranspose + Sigmoid.
  * gaussian_encoder: the encoder trunk plus mu/logvar linear heads and
    reparameterized sampling (vgg_64.py:108-159) — unused by the reference
    drivers but shipped for capability parity.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from dvg_tpu.models import layers as L


def _enc_groups(image_width: int, nc: int) -> List[List[int]]:
    """Per-group channel chains [in, out, out, ...] (vgg_64.py:21-44)."""
    if image_width == 64:
        return [[nc, 64, 64], [64, 128, 128], [128, 256, 256, 256],
                [256, 512, 512, 512]]
    if image_width == 128:
        return [[nc, 64, 64], [64, 128, 128], [128, 256, 256, 256],
                [256, 512, 512, 512], [512, 512, 512, 512]]
    raise ValueError(f"vgg backbone supports image_width 64|128, got {image_width}")


def _dec_groups(image_width: int) -> List[List[int]]:
    """Decoder conv-group chains, first input doubled by skip concat."""
    if image_width == 64:
        # upc2..upc4 (vgg_64.py:71-88) + upc5 conv part (vgg_64.py:90)
        return [[512 * 2, 512, 512, 256], [256 * 2, 256, 256, 128],
                [128 * 2, 128, 64], [64 * 2, 64]]
    if image_width == 128:
        # upc2..upc6 (vgg_128.py:77-106)
        return [[512 * 2, 512, 512, 512], [512 * 2, 512, 512, 256],
                [256 * 2, 256, 256, 128], [128 * 2, 128, 64], [64 * 2, 64]]
    raise ValueError(f"vgg backbone supports image_width 64|128, got {image_width}")


def _group_init(key, chain: List[int]) -> List[Dict]:
    keys = jax.random.split(key, len(chain) - 1)
    return [L.conv_block_init(k, ci, co, 3)
            for k, ci, co in zip(keys, chain[:-1], chain[1:])]


def _group_stats_init(chain: List[int]) -> List[Dict]:
    return [L.conv_block_stats_init(co) for co in chain[1:]]


def _group_apply(params, stats, x, train, axis_name=None):
    new_stats = []
    for p, s in zip(params, stats):
        x, ns = L.conv_block_apply(p, s, x, train, stride=1, padding=1,
                                   act=L.leaky_relu, axis_name=axis_name)
        new_stats.append(ns)
    return x, new_stats


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def encoder_init(key, dim: int, nc: int = 1, image_width: int = 64) -> Dict:
    groups = _enc_groups(image_width, nc)
    keys = jax.random.split(key, len(groups) + 1)
    return {
        "groups": [_group_init(k, g) for k, g in zip(keys[:-1], groups)],
        "head": L.conv_block_init(keys[-1], groups[-1][-1], dim, 4),
    }


def encoder_stats_init(dim: int, nc: int = 1, image_width: int = 64) -> Dict:
    groups = _enc_groups(image_width, nc)
    return {
        "groups": [_group_stats_init(g) for g in groups],
        "head": L.conv_block_stats_init(dim),
    }


def encoder_apply(params, stats, x, train: bool, axis_name=None):
    skips = []
    new_group_stats = []
    h = x
    for i, (p, s) in enumerate(zip(params["groups"], stats["groups"])):
        if i > 0:
            h = L.max_pool2d(h, 2, 2)
        h, ns = _group_apply(p, s, h, train, axis_name)
        skips.append(h)
        new_group_stats.append(ns)
    h = L.max_pool2d(h, 2, 2)
    h, head_stats = L.conv_block_apply(params["head"], stats["head"], h, train,
                                       stride=1, padding=0, act=jnp.tanh,
                                       axis_name=axis_name)
    vec = h.reshape(h.shape[0], -1)
    return (vec, skips), {"groups": new_group_stats, "head": head_stats}


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decoder_init(key, dim: int, nc: int = 1, image_width: int = 64) -> Dict:
    groups = _dec_groups(image_width)
    keys = jax.random.split(key, len(groups) + 2)
    return {
        "head": L.upconv_block_init(keys[0], dim, 512, 4),
        "groups": [_group_init(k, g) for k, g in zip(keys[1:-1], groups)],
        "final": L.conv_transpose2d_init(keys[-1], 64, nc, 3),
    }


def decoder_stats_init(dim: int, nc: int = 1, image_width: int = 64) -> Dict:
    groups = _dec_groups(image_width)
    return {
        "head": {"bn": L.batchnorm_stats_init(512)},
        "groups": [_group_stats_init(g) for g in groups],
    }


def encoder_fold(params, stats):
    """Inference-time params with eval-mode BN folded into every conv."""
    return {
        "groups": [[L.fold_conv_bn(p, s) for p, s in zip(gp, gs)]
                   for gp, gs in zip(params["groups"], stats["groups"])],
        "head": L.fold_conv_bn(params["head"], stats["head"]),
    }


def decoder_fold(params, stats):
    return {
        "head": L.fold_conv_bn(params["head"], stats["head"]),
        "groups": [[L.fold_conv_bn(p, s) for p, s in zip(gp, gs)]
                   for gp, gs in zip(params["groups"], stats["groups"])],
        "final": params["final"],          # no BN on the output head
    }


def decoder_apply_grouped(params, stats, vecs, skips_unique, group_idx,
                          train: bool, image_width: int = 64, axis_name=None):
    """Decode N latent variants sharing skip frames from a small unique set
    (the train step's joint pass; see dcgan.decoder_apply_grouped for the
    full rationale). Only each group's FIRST conv consumes the channel
    concat (vgg_64.py:97-105), so only that conv splits by linearity:
        conv(cat(u, s), W) = conv(u, W[:, :, :c_u]) + conv(s, W[:, :, c_u:])
    with the skip half computed once per UNIQUE skip frame and broadcast to
    calls through a 0/1 tensordot (dense in both AD directions — an index
    gather would transpose to a TPU-serialized scatter-add).

    vecs: (N, B, dim); skips_unique: per-stage (U, B, h, w, c);
    group_idx: (N,) int32. Per-call train-mode BN throughout. Returns
    (frames (N, B, H, W, nc), per-call stats with leading N axis)."""
    n, b = vecs.shape[0], vecs.shape[1]
    cdt = vecs.dtype
    num_u = skips_unique[0].shape[0]
    onehot = jax.nn.one_hot(jnp.asarray(group_idx), num_u, dtype=cdt)

    def per_call_bn(p, s, y, act):
        def one(yc):
            out, ns = L.batchnorm_apply(p["bn"], s["bn"], yc.astype(cdt),
                                        train, axis_name=axis_name)
            return act(out), {"bn": ns}
        return jax.vmap(one)(y)

    def flat(a):
        return a.reshape((n * b,) + a.shape[2:])

    def unflat(a):
        return a.reshape((n, b) + a.shape[1:])

    # head: ConvTranspose 1x1 → 4x4, per-call BN
    d0 = vecs.reshape(n * b, 1, 1, vecs.shape[-1])
    y = L.conv_transpose2d_raw(params["head"]["conv"]["w"], d0, 1, 0)
    y = unflat(y + params["head"]["conv"]["b"].astype(y.dtype))
    d, head_stats = per_call_bn(params["head"], stats["head"], y,
                                L.leaky_relu)

    new_group_stats = []
    for p_group, s_group, sk_u in zip(params["groups"], stats["groups"],
                                      reversed(skips_unique)):
        up = L.upsample_nearest2d(flat(d), 2)
        p0 = p_group[0]
        c_u = up.shape[-1]
        w = p0["conv"]["w"]
        u = sk_u.shape[0]
        d_out = unflat(L.conv2d_raw(w[:, :, :c_u], up, 1, 1))
        s_out = L.conv2d_raw(
            w[:, :, c_u:], sk_u.reshape((u * b,) + sk_u.shape[2:]), 1, 1)
        s_out = s_out.reshape((u, b) + s_out.shape[1:])
        y = d_out + jnp.tensordot(onehot, s_out, axes=1) \
            + p0["conv"]["b"].astype(d_out.dtype)
        d, ns0 = per_call_bn(p0, s_group[0], y, L.leaky_relu)
        group_stats = [ns0]
        for p, s in zip(p_group[1:], s_group[1:]):
            y = unflat(L.conv2d_apply(p["conv"], flat(d), stride=1,
                                      padding=1))
            d, ns = per_call_bn(p, s, y, L.leaky_relu)
            group_stats.append(ns)
        new_group_stats.append(group_stats)

    out = L.conv_transpose2d_apply(params["final"], flat(d), stride=1,
                                   torch_padding=1)
    out = unflat(jax.nn.sigmoid(out))
    return out, {"head": head_stats, "groups": new_group_stats}


def decoder_skip_pre(params, skips, image_width: int = 64):
    """Skip-half contribution of each decoder group's FIRST conv for a
    FROZEN skip set (only that conv consumes the channel concat,
    vgg_64.py:97-105) — hoisted out of the rollout scan exactly like
    dcgan.decoder_skip_pre (see its docstring for the linearity split and
    the broadcast-batch contract)."""
    del image_width
    outs = []
    for p_group, skip in zip(params["groups"], reversed(skips)):
        w = p_group[0]["conv"]["w"]
        c_s = skip.shape[-1]
        outs.append(L.conv2d_raw(w[:, :, w.shape[2] - c_s:], skip, 1, 1))
    return outs


def decoder_apply_hoisted(params, vec, skip_pre, image_width: int = 64):
    """Eval-mode decode against precomputed skip halves (decoder_skip_pre).
    Requires BN-folded params; returns frames only. Numerics note in
    dcgan.decoder_apply_hoisted applies."""
    del image_width
    if "bn" in params["groups"][0][0]:
        raise ValueError(
            "decoder_apply_hoisted requires BN-folded params — call "
            "model.fold_inference_params(params, stats) first")
    d = vec.reshape(vec.shape[0], 1, 1, vec.shape[-1])
    d = L.leaky_relu(L.conv_transpose2d_apply(params["head"]["conv"], d,
                                              stride=1, torch_padding=0))
    for p_group, pre in zip(params["groups"], skip_pre):
        up = L.upsample_nearest2d(d, 2)
        p0 = p_group[0]
        y = L.conv2d_raw(p0["conv"]["w"][:, :, :up.shape[-1]], up, 1, 1)
        d = L.leaky_relu(L.broadcast_add(y, pre)
                         + p0["conv"]["b"].astype(y.dtype))
        for p in p_group[1:]:
            d = L.leaky_relu(L.conv2d_apply(p["conv"], d, stride=1,
                                            padding=1))
    out = L.conv_transpose2d_apply(params["final"], d, stride=1,
                                   torch_padding=1)
    return jax.nn.sigmoid(out)


def decoder_apply(params, stats, vec, skips, train: bool, image_width: int = 64,
                  axis_name=None):
    d = vec.reshape(vec.shape[0], 1, 1, vec.shape[-1])
    d, head_stats = L.upconv_block_apply(params["head"], stats["head"], d, train,
                                         stride=1, torch_padding=0,
                                         act=L.leaky_relu, axis_name=axis_name)
    new_group_stats = []
    for p, s, skip in zip(params["groups"], stats["groups"], reversed(skips)):
        d = L.upsample_nearest2d(d, 2)
        d = jnp.concatenate([d, skip], axis=-1)
        d, ns = _group_apply(p, s, d, train, axis_name)
        new_group_stats.append(ns)
    out = L.conv_transpose2d_apply(params["final"], d, stride=1, torch_padding=1)
    out = jax.nn.sigmoid(out)
    return out, {"head": head_stats, "groups": new_group_stats}


# ---------------------------------------------------------------------------
# gaussian encoder (VAE head; reference vgg_64.py:108-159)
# ---------------------------------------------------------------------------

def gaussian_encoder_init(key, dim: int, output_size: int, nc: int = 1,
                          image_width: int = 64) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "trunk": encoder_init(k1, dim, nc, image_width),
        "mu": L.linear_init(k2, dim, output_size),
        "logvar": L.linear_init(k3, dim, output_size),
    }


def gaussian_encoder_stats_init(dim: int, nc: int = 1,
                                image_width: int = 64) -> Dict:
    return {"trunk": encoder_stats_init(dim, nc, image_width)}


def gaussian_encoder_apply(params, stats, x, train: bool, rng,
                           axis_name=None):
    """VAE head over the encoder trunk. `axis_name` threads through to the
    trunk's BatchNorm like every other *_apply here, so shard_map data
    parallelism keeps global-batch statistics (layers.py batchnorm)."""
    (h, skips), trunk_stats = encoder_apply(params["trunk"], stats["trunk"],
                                            x, train, axis_name=axis_name)
    mu = L.linear_apply(params["mu"], h)
    logvar = L.linear_apply(params["logvar"], h)
    eps = jax.random.normal(rng, mu.shape, mu.dtype)
    z = mu + jnp.exp(0.5 * logvar) * eps
    return (z, mu, logvar, skips), {"trunk": trunk_stats}
