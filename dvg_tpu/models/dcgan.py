"""DCGAN encoder/decoder backbones (64px and 128px variants).

Behavioral parity with /root/reference/models/dcgan_64.py and dcgan_128.py:
  * encoder: stride-2 4x4 conv+BN+LeakyReLU(0.2) stages halving resolution,
    then a 4x4 VALID conv+BN+Tanh head collapsing 4x4 → 1x1 → g_dim vector;
    returns the vector plus the per-stage feature maps as U-Net skips
    (dcgan_64.py:48-54).
  * decoder: ConvTranspose head 1x1 → 4x4, then stride-2 4x4 upconv stages
    each consuming concat([d, skip]) (dcgan_64.py:82-87). Final activation is
    Tanh for the 64px variant (dcgan_64.py:76) and Sigmoid for the 128px
    variant (dcgan_128.py:81) — a reference quirk reproduced on purpose.

Images are NHWC. All channel widths are multiples of 64 → MXU-friendly.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from dvg_tpu.models import layers as L

NF = 64


def _stage_channels(image_width: int, nc: int) -> List[Tuple[int, int]]:
    if image_width == 64:
        return [(nc, NF), (NF, NF * 2), (NF * 2, NF * 4), (NF * 4, NF * 8)]
    if image_width == 128:
        return [(nc, NF), (NF, NF * 2), (NF * 2, NF * 4), (NF * 4, NF * 8),
                (NF * 8, NF * 8)]
    raise ValueError(f"dcgan backbone supports image_width 64|128, got {image_width}")


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def encoder_init(key, dim: int, nc: int = 1, image_width: int = 64) -> Dict:
    chans = _stage_channels(image_width, nc)
    keys = jax.random.split(key, len(chans) + 1)
    params = {
        "stages": [L.conv_block_init(k, ci, co, 4)
                   for k, (ci, co) in zip(keys[:-1], chans)],
        "head": L.conv_block_init(keys[-1], chans[-1][1], dim, 4),
    }
    return params


def encoder_stats_init(dim: int, nc: int = 1, image_width: int = 64) -> Dict:
    chans = _stage_channels(image_width, nc)
    return {
        "stages": [L.conv_block_stats_init(co) for _, co in chans],
        "head": L.conv_block_stats_init(dim),
    }


def encoder_apply(params, stats, x, train: bool, axis_name=None):
    """x: (B, H, W, C) → ((h: (B, dim), skips: list of feature maps), stats)."""
    skips = []
    new_stage_stats = []
    h = x
    for p, s in zip(params["stages"], stats["stages"]):
        h, ns = L.conv_block_apply(p, s, h, train, stride=2, padding=1,
                                   act=L.leaky_relu, axis_name=axis_name)
        skips.append(h)
        new_stage_stats.append(ns)
    h, head_stats = L.conv_block_apply(params["head"], stats["head"], h, train,
                                       stride=1, padding=0, act=jnp.tanh,
                                       axis_name=axis_name)
    vec = h.reshape(h.shape[0], -1)
    new_stats = {"stages": new_stage_stats, "head": head_stats}
    return (vec, skips), new_stats


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _decoder_stage_channels(image_width: int) -> List[Tuple[int, int]]:
    if image_width == 64:
        # upc2..upc4 of dcgan_64.py:68-72
        return [(NF * 8 * 2, NF * 4), (NF * 4 * 2, NF * 2), (NF * 2 * 2, NF)]
    if image_width == 128:
        # upc2..upc5 of dcgan_128.py:64-72
        return [(NF * 8 * 2, NF * 8), (NF * 8 * 2, NF * 4),
                (NF * 4 * 2, NF * 2), (NF * 2 * 2, NF)]
    raise ValueError(f"dcgan backbone supports image_width 64|128, got {image_width}")


def decoder_init(key, dim: int, nc: int = 1, image_width: int = 64) -> Dict:
    chans = _decoder_stage_channels(image_width)
    keys = jax.random.split(key, len(chans) + 2)
    return {
        "head": L.upconv_block_init(keys[0], dim, NF * 8, 4),
        "stages": [L.upconv_block_init(k, ci, co, 4)
                   for k, (ci, co) in zip(keys[1:-1], chans)],
        "final": L.conv_transpose2d_init(keys[-1], NF * 2, nc, 4),
    }


def decoder_stats_init(dim: int, nc: int = 1, image_width: int = 64) -> Dict:
    chans = _decoder_stage_channels(image_width)
    return {
        "head": {"bn": L.batchnorm_stats_init(NF * 8)},
        "stages": [{"bn": L.batchnorm_stats_init(co)} for _, co in chans],
    }


def encoder_fold(params, stats):
    """Inference-time params with eval-mode BN folded into every conv
    (layers.fold_conv_bn) — same outputs, one fewer elementwise pass per
    stage."""
    return {
        "stages": [L.fold_conv_bn(p, s)
                   for p, s in zip(params["stages"], stats["stages"])],
        "head": L.fold_conv_bn(params["head"], stats["head"]),
    }


def decoder_fold(params, stats):
    return {
        "head": L.fold_conv_bn(params["head"], stats["head"]),
        "stages": [L.fold_conv_bn(p, s)
                   for p, s in zip(params["stages"], stats["stages"])],
        "final": params["final"],          # no BN on the output head
    }


def decoder_apply_grouped(params, stats, vecs, skips_unique, group_idx,
                          train: bool, image_width: int = 64, axis_name=None):
    """Decode N latent variants whose skip tensors come from a small set of
    UNIQUE skip frames — the train step's joint pass decodes V=3 variants ×
    (T-1) steps but (with last_frame_skip off) all free-run steps share the
    frame n_past-2 skip (reference train.py:217-220), so only ~n_past-1
    distinct skip frames exist.

    vecs: (N, B, dim); skips_unique: per-stage (U, B, h, w, c);
    group_idx: (N,) int32 — call n reads skips_unique[...][group_idx[n]].

    Semantically identical to vmapping `decoder_apply` over N with gathered
    skips (per-call train-mode BN over each call's own B batch), but each
    stage's transposed conv splits by linearity over the channel concat:
        convT(cat(d, s), W) = convT(d, W[:, :, :c_d]) + convT(s, W[:, :, c_d:])
    so the skip half runs once per UNIQUE frame (U·B batch) instead of per
    call (N·B) — and the V-times-tiled skip broadcast + concat copies the
    generic path pays disappear entirely. Each partial accumulates in f32
    INSIDE its conv and rounds once to the compute dtype on output; the sum
    then happens in that dtype, so in bf16 each half carries one output
    rounding — the same order of noise the fused conv's single output
    rounding already injects into bf16 training (exact in f32 mode).
    Returns (frames (N, B, H, W, nc), per-call stats with leading N axis)."""
    final_act = jnp.tanh if image_width == 64 else jax.nn.sigmoid
    n, b = vecs.shape[0], vecs.shape[1]
    cdt = vecs.dtype
    num_u = skips_unique[0].shape[0]
    # 0/1 call→unique-skip matrix: broadcasting the per-unique conv outputs
    # to calls as a matmul keeps the BACKWARD a dense MXU reduction; an
    # index gather here transposes to a scatter-add, which the TPU
    # serializes (profiled 16+ ms/step of while-loop + copies)
    onehot = jax.nn.one_hot(jnp.asarray(group_idx), num_u, dtype=cdt)

    def per_call_bn(p, s, y, act):
        # y: (N, B, h, w, c); each call normalizes over its own B batch
        # (torch train-mode BN per decoder call)
        def one(yc):
            out, ns = L.batchnorm_apply(p["bn"], s["bn"], yc.astype(cdt),
                                        train, axis_name=axis_name)
            return act(out), {"bn": ns}
        return jax.vmap(one)(y)

    def split_convT(p, d, sk_u, stride, torch_padding):
        c_d = d.shape[-1]
        w = p["w"] if "w" in p else p["conv"]["w"]
        bias = p["b"] if "b" in p else p["conv"]["b"]
        w_d, w_s = w[:, :, :c_d], w[:, :, c_d:]
        d_out = L.conv_transpose2d_raw(
            w_d, d.reshape((n * b,) + d.shape[2:]), stride, torch_padding)
        d_out = d_out.reshape((n, b) + d_out.shape[1:])
        u = sk_u.shape[0]
        s_out = L.conv_transpose2d_raw(
            w_s, sk_u.reshape((u * b,) + sk_u.shape[2:]), stride,
            torch_padding)
        # (u·b, h, w, c) → per-call contributions via the 0/1 matmul over
        # the LEADING axis only (leading-dim split reshape is free; a
        # flatten-to-(u, F) form forces tiled-layout copies). The forward
        # picks exactly one row per call (exact in any dtype).
        s_out = s_out.reshape((u, b) + s_out.shape[1:])
        s_b = jnp.tensordot(onehot, s_out, axes=1)
        return d_out + s_b + bias.astype(d_out.dtype)

    # head: no skip; flat (N·B) conv then per-call BN
    d0 = vecs.reshape(n * b, 1, 1, vecs.shape[-1])
    y = L.conv_transpose2d_raw(params["head"]["conv"]["w"], d0, 1, 0)
    y = (y + params["head"]["conv"]["b"].astype(y.dtype)
         ).reshape((n, b) + y.shape[1:])
    d, head_stats = per_call_bn(params["head"], stats["head"], y,
                                L.leaky_relu)

    new_stage_stats = []
    for p, s, sk_u in zip(params["stages"], stats["stages"],
                          reversed(skips_unique)):
        y = split_convT(p, d, sk_u, stride=2, torch_padding=1)
        d, ns = per_call_bn(p, s, y, L.leaky_relu)
        new_stage_stats.append(ns)

    y = split_convT(params["final"], d, skips_unique[0], stride=2,
                    torch_padding=1)
    out = final_act(y.astype(cdt))
    return out, {"head": head_stats, "stages": new_stage_stats}


def decoder_skip_pre(params, skips, image_width: int = 64):
    """Skip-half convT contribution of every decoder stage for a FROZEN
    skip set — the hoisted-out-of-the-scan half of the linearity split
        convT(cat(d, s), W) = convT(d, W[:, :, :c_d]) + convT(s, W[:, :, c_d:]).

    Generation free-runs keep the skip features frozen at the last context
    frame (reference generate_frames.py:116-127), so the skip half of each
    stage's transposed conv is loop-invariant: computing it ONCE here
    removes ~half the decoder FLOPs from every scan step of the rollout hot
    loop, plus the (S·B)-tiled skip reads (PERF.md r5). Entries align with
    decoder_apply_hoisted's stage order (stages top-down, then the final
    head). The returned tensors keep the skips' batch size, which may be
    SMALLER than the rollout latent batch (merged sample·batch axis) —
    decoder_apply_hoisted broadcast-adds over the sample factor."""
    del image_width
    outs = []
    for p, skip in zip(params["stages"], reversed(skips)):
        w = p["conv"]["w"]
        c_s = skip.shape[-1]
        outs.append(L.conv_transpose2d_raw(w[:, :, w.shape[2] - c_s:],
                                           skip, 2, 1))
    wf = params["final"]["w"]
    c_s = skips[0].shape[-1]
    outs.append(L.conv_transpose2d_raw(wf[:, :, wf.shape[2] - c_s:],
                                       skips[0], 2, 1))
    return outs


def decoder_apply_hoisted(params, vec, skip_pre, image_width: int = 64):
    """Eval-mode decode consuming precomputed skip-half contributions
    (decoder_skip_pre). Requires BN-folded params (fold_inference_params)
    — eval is the only mode the hoist is valid for, and folding is what the
    rollout prep() already does. Returns frames only (no stats in eval).

    Numerics: each conv half accumulates in f32 internally and rounds once
    to the compute dtype on output; the halves then sum in that dtype — in
    bf16 that is one extra output-magnitude rounding vs the fused conv,
    the same order of noise as decoder_apply_grouped (see its docstring)."""
    if "bn" in params["stages"][0]:
        raise ValueError(
            "decoder_apply_hoisted requires BN-folded params — call "
            "model.fold_inference_params(params, stats) first")
    final_act = jnp.tanh if image_width == 64 else jax.nn.sigmoid
    d = vec.reshape(vec.shape[0], 1, 1, vec.shape[-1])
    d = L.leaky_relu(L.conv_transpose2d_apply(params["head"]["conv"], d,
                                              stride=1, torch_padding=0))
    for p, pre in zip(params["stages"], skip_pre[:-1]):
        w, b = p["conv"]["w"], p["conv"]["b"]
        y = L.conv_transpose2d_raw(w[:, :, :d.shape[-1]], d, 2, 1)
        d = L.leaky_relu(L.broadcast_add(y, pre) + b.astype(y.dtype))
    wf, bf = params["final"]["w"], params["final"]["b"]
    y = L.conv_transpose2d_raw(wf[:, :, :d.shape[-1]], d, 2, 1)
    return final_act(L.broadcast_add(y, skip_pre[-1]) + bf.astype(y.dtype))


def decoder_apply(params, stats, vec, skips, train: bool, image_width: int = 64,
                  axis_name=None):
    """(vec: (B, dim), skips from encoder) → (x: (B, H, W, nc), stats)."""
    final_act = jnp.tanh if image_width == 64 else jax.nn.sigmoid
    d = vec.reshape(vec.shape[0], 1, 1, vec.shape[-1])
    d, head_stats = L.upconv_block_apply(params["head"], stats["head"], d, train,
                                         stride=1, torch_padding=0,
                                         act=L.leaky_relu, axis_name=axis_name)
    new_stage_stats = []
    for p, s, skip in zip(params["stages"], stats["stages"], reversed(skips)):
        d = jnp.concatenate([d, skip], axis=-1)
        d, ns = L.upconv_block_apply(p, s, d, train, stride=2, torch_padding=1,
                                     act=L.leaky_relu, axis_name=axis_name)
        new_stage_stats.append(ns)
    d = jnp.concatenate([d, skips[0]], axis=-1)
    out = L.conv_transpose2d_apply(params["final"], d, stride=2, torch_padding=1)
    out = final_act(out)
    new_stats = {"head": head_stats, "stages": new_stage_stats}
    return out, new_stats
