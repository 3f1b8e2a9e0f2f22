"""The jitted DVG train step: three gradient passes, fully batched.

Reference semantics reproduced (/root/reference/train.py):

  * **joint pass** (`train_model`, train.py:200-248): teacher-forced rollout
    over t = 1..T-1 computing five loss terms —
      loss = 1000·ae_mse + 0.001·mse + 0.01·mse_latent + 0.001·mse_gp
             + 0.0001·max_ll.sum()                       (train.py:239)
    then all four optimizers step (train.py:240-245).
  * **LSTM finetune pass** (`train_frame_predictor`, train.py:175-198):
    same rollout, loss = Σ mse_latent, only the frame_predictor steps.
  * **GP finetune pass** (`train_GP_Frame_predictor`, train.py:146-172):
    loss = Σ(-ELBO), only gp+likelihood step; h_target detached (irrelevant
    here since only GP params receive gradient anyway).
  Both finetune passes run when cfg.ft (train.py:250-253, default on).

TPU-first restructuring (what makes this ≫ the per-frame Python loop):

  * the T-frame encoder sweep is ONE vmapped conv pass — each frame still
    normalizes with its own per-frame BatchNorm batch statistics (matching
    torch train-mode BN applied per frame), but the convs land on the MXU
    as a single (T·B)-batch program;
  * the 3·(T-1) decoder calls of the joint pass (x_pred / x_target_pred /
    x_pred_gp per frame, train.py:227-232) are ONE vmapped conv pass;
  * the LSTM is teacher-forced, so its inputs don't depend on its outputs:
    embed/output projections batch over all T, only the cell recurrence is
    a `lax.scan`;
  * the per-frame GP ELBO sum collapses analytically:
      Σ_t [mean_B ll_t − KL/B] = (T−1) · elbo(all (T−1)·B pairs, num_data=B)
    so the GP sees one batched (90-task) Cholesky per pass, not T−1;
  * BatchNorm running statistics are folded in closed form: torch applies
    `r ← (1−m)·r + m·s_k` once per module call in a fixed order; given the
    per-call batch stats s_k this telescopes to
      r_N = (1−m)^N·r_0 + Σ_k m·(1−m)^(N−1−k)·s_k
    (`_fold_stats`), reproducing the reference's EMA exactly — including
    the quirk that the joint pass encodes interior frames twice per step
    (x[i−1] and x[i], train.py:214-215), so interior frames carry double
    EMA weight.

Documented deviation: torch lets GP gradients from the previous batch's
finetune pass leak into the next joint-pass `optimizer.step()` because
`train_model` never zeroes the GP optimizer (train.py:200-207 zero only
encoder/decoder/frame_predictor). We compute fresh gradients per pass —
the leak is an accumulation artifact of `.backward()`, not a design.
MEASURED (tests/test_trained_model_parity.py::test_gp_grad_leak_quantified,
float64, two consecutive batches of torch-with-leak vs torch-without-leak
from identical weights): encoder/decoder/LSTM parameters stay BITWISE
identical; the GP group diverges by max |Δ| ≈ 0.9–1.3e-3 per tensor
(≈ 0.45–0.65 × gp_lr=2e-3 — i.e. a fraction of one Adam step on the GP
group only).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dvg_tpu.config import DVGConfig
from dvg_tpu.models import gp as gp_mod
from dvg_tpu.models import layers as L
from dvg_tpu.models import rnn as rnn_mod
from dvg_tpu.models.dvg import DVGModel
from dvg_tpu.train.optim import (Optimizers, make_optimizers, merge_params,
                                 split_params)


# ---------------------------------------------------------------------------
# BatchNorm running-stat EMA folding
# ---------------------------------------------------------------------------

def _ema_weights(order, n_slots: int, momentum: float):
    """weights[j] = Σ_{k: order[k]==j} m·(1−m)^(N−1−k);  decay = (1−m)^N.

    Computed in f64 host-side; jnp.asarray canonicalizes to f32 unless x64
    is enabled (the f64 update-parity test needs full precision here)."""
    n = len(order)
    w = np.zeros((n_slots,), np.float64)
    for k, j in enumerate(order):
        w[j] += momentum * (1.0 - momentum) ** (n - 1 - k)
    return jnp.asarray(w), np.float64((1.0 - momentum) ** n)


def _fold_stats(old_stats, per_call_stats, weights, decay,
                momentum: float = L.BN_MOMENTUM, base_stats=None):
    """Fold per-call BN stats (leading call axis) into the running stats.

    `per_call_stats` come out of batchnorm_apply already EMA'd against the
    stats that were live AT ENCODE TIME — recovering the raw batch statistic
    needs that same base. When a pass folds stats that were computed against
    an EARLIER running-stat snapshot (the shared finetune encode feeding
    pass 3 after pass 2 already folded), pass that snapshot as
    `base_stats`; default: old_stats IS the encode-time base."""
    if base_stats is None:
        base_stats = old_stats

    def leaf(o, pc, ba):
        batch = (pc - (1.0 - momentum) * ba) / momentum
        return decay * o + jnp.tensordot(weights, batch, axes=1)

    return jax.tree.map(leaf, old_stats, per_call_stats, base_stats)


# ---------------------------------------------------------------------------
# batched module sweeps
# ---------------------------------------------------------------------------

def encode_frames(model: DVGModel, params, stats, x, axis_name=None,
                  remat: bool = False):
    """Encode all T frames in one vmapped pass (train-mode BN per frame).

    x: (T, B, H, W, C) → (h (T,B,G), skips [per-stage (T,B,h,w,c)],
    per-frame stats with leading T axis). Under shard_map DP, `axis_name`
    makes the per-frame BN statistics global-batch. With `remat`, the
    backward pass recomputes encoder activations instead of storing all T
    frames' feature maps (trades ~1 extra forward for O(T) memory)."""

    def enc(xt):
        return model.encode(params, stats, xt, train=True,
                            axis_name=axis_name)

    if remat:
        enc = jax.checkpoint(enc)
    (h, skips), per_frame_stats = jax.vmap(enc)(x)
    return h, skips, per_frame_stats


def fold_encoder_stats(stats, per_frame_stats, seq_len: int, repeats: int = 2,
                       base_stats=None):
    """Joint/finetune passes encode frames in order
    [x0, x1, x1, x2, x2, ..., x_{T-1}] (train.py:214-215: x[i-1] then x[i]
    per step) — interior frames appear `repeats` times.

    `base_stats`: the stats snapshot the per-frame stats were computed
    against, when it differs from `stats` (see _fold_stats)."""
    # encode sequence per step i=1..T-1: x[i-1], x[i] → [0,1,1,2,2,...,T-2,T-2,T-1]
    order = [0]
    for i in range(1, seq_len):
        order.extend([i] * (repeats if i < seq_len - 1 else 1))
    w, decay = _ema_weights(order, seq_len, L.BN_MOMENTUM)
    base = None if base_stats is None else base_stats["encoder"]
    return {"encoder": _fold_stats(stats["encoder"], per_frame_stats, w,
                                   decay, base_stats=base),
            "decoder": stats["decoder"]}


def decode_variants(model: DVGModel, params, stats, latents, skips,
                    skip_idx, axis_name=None, remat: bool = False):
    """Decode a (V, T-1, B, G) stack of latent variants; step i of variant v
    uses the skip maps of frame skip_idx[i] (each skip (T, B, h, w, c)).
    Per-call train-mode BN throughout.

    When the backbone provides a grouped decoder (dcgan), the V·(T-1) calls
    run through decoder_apply_grouped: the skip half of every transposed
    conv computes once per UNIQUE skip frame (with last_frame_skip off
    that's n_past-1 frames, not V·(T-1) calls) — profiled ~13 ms/step off
    the 70 ms dcgan-64 train step. The generic path tiles + concats.

    Returns (frames (V, T-1, B, H, W, C), folded decoder stats in the
    reference call order: per step i the V variants decode back-to-back
    (train.py:227-232))."""
    v, tm1 = latents.shape[0], latents.shape[1]
    lat_flat = latents.reshape((v * tm1,) + latents.shape[2:])
    skip_idx = np.asarray(skip_idx)

    grouped = model.backbone.decoder_apply_grouped
    if grouped is not None:
        uniq, inv = np.unique(skip_idx, return_inverse=True)
        skips_u = [s[jnp.asarray(uniq)] for s in skips]
        gi = jnp.asarray(np.tile(inv, v).astype(np.int32))

        def dec_grouped(lat_flat, *sk_u):
            return grouped(params["decoder"], stats["decoder"], lat_flat,
                           list(sk_u), gi, train=True, axis_name=axis_name)

        if remat:
            dec_grouped = jax.checkpoint(dec_grouped)
        frames, per_call = dec_grouped(lat_flat, *skips_u)
    else:
        skips_sel = [s[jnp.asarray(skip_idx)] for s in skips]
        skips_flat = [jnp.broadcast_to(s[None], (v,) + s.shape)
                      .reshape((v * tm1,) + s.shape[1:]) for s in skips_sel]

        def dec(h, *sk):
            return model.decode(params, stats, h, list(sk), train=True,
                                axis_name=axis_name)

        if remat:
            dec = jax.checkpoint(dec)
        frames, per_call = jax.vmap(dec)(lat_flat, *skips_flat)
    frames = frames.reshape((v, tm1) + frames.shape[1:])

    # reference call order: k = (i-1)*V + variant → our flat axis is
    # variant-major (s*tm1 + i), so map positions accordingly
    n = v * tm1
    pos = np.empty((n,), np.int64)
    for i in range(tm1):
        for s in range(v):
            pos[s * tm1 + i] = i * v + s   # time-major call index
    m = L.BN_MOMENTUM
    w_by_call_order = m * (1.0 - m) ** (n - 1 - pos)
    w = jnp.asarray(w_by_call_order)
    decay = np.float64((1.0 - m) ** n)
    dec_stats = _fold_stats(stats["decoder"], per_call, w, decay)
    return frames, dec_stats


def lstm_teacher_forced(params, h_in):
    """Run the latent LSTM over teacher-forced inputs h_in (T-1, B, G) →
    predictions (T-1, B, G). Hidden init per sequence (lstm.py:21-27)."""
    tm1, b = h_in.shape[0], h_in.shape[1]
    n_layers = len(params["cells"])
    hidden0 = rnn_mod.lstm_hidden_init(b, params["cells"][0]["w_hh"].shape[0],
                                       n_layers, dtype=h_in.dtype)

    def step(hidden, x_t):
        out, hidden = rnn_mod.lstm_apply(params, hidden, x_t)
        return hidden, out

    _, preds = jax.lax.scan(step, hidden0, h_in)
    return preds


def skip_index(seq_len: int, n_past: int, last_frame_skip: bool):
    """Per-step skip SOURCE FRAME for steps i = 1..T-1: frame i-1 while
    i < n_past, frozen at frame n_past-2 afterwards (train.py:217-220).
    Returns a static numpy (T-1,) index array."""
    if last_frame_skip:
        return np.arange(0, seq_len - 1)
    return np.minimum(np.arange(0, seq_len - 1), max(n_past - 2, 0))


def skip_gather(skips, seq_len: int, n_past: int, last_frame_skip: bool):
    """Gathered per-step skips (see skip_index)."""
    idx = jnp.asarray(skip_index(seq_len, n_past, last_frame_skip))
    return [s[idx] for s in skips]


# ---------------------------------------------------------------------------
# loss passes
# ---------------------------------------------------------------------------

def _f32up(a):
    """Cast to at least f32 (loss/GP math precision floor); under the f64
    parity tests the wider dtype is kept."""
    return a.astype(jnp.promote_types(a.dtype, jnp.float32))


def _gp_pairs(h_all):
    """(T,B,G) → per-step GP task-layout pairs: x (T-1, G, B, 1),
    y (T-1, G, B).

    Time stays a leading vmap axis and the batch axis is NEVER merged —
    merging (T-1, B) into one axis would reshape across the sharded batch
    dimension and force the SPMD partitioner to replicate everything
    downstream. Σ_t elbo_t(num_data=B) is exactly the reference's per-frame
    mll sum (train.py:225-226)."""
    x = jnp.swapaxes(h_all[:-1], 1, 2)[..., None]
    y = jnp.swapaxes(h_all[1:], 1, 2)
    return x, y


def _mixed_cast(params, x, cfg: DVGConfig):
    """cfg.dtype='bfloat16' mixed precision: the conv/LSTM compute runs in
    bf16 (the cast is differentiable — grads accumulate back into the f32
    master params); GP/likelihood params and all loss math stay f32."""
    if cfg.dtype != "bfloat16":
        return params, x
    bf = jnp.bfloat16

    def cast(t):
        return jax.tree.map(
            lambda a: a.astype(bf) if a.dtype == jnp.float32 else a, t)

    params = dict(params,
                  encoder=cast(params["encoder"]),
                  decoder=cast(params["decoder"]),
                  frame_predictor=cast(params["frame_predictor"]))
    return params, x.astype(bf)


def joint_loss(params, stats, x, model: DVGModel, cfg: DVGConfig,
               axis_name=None):
    """The train_model loss (train.py:213-239). Returns (loss, aux).

    Under shard_map DP (`axis_name`): BN stats are global-batch, the GP
    num_data stays the GLOBAL batch size, and every loss term is pmean'd —
    so the pmean's psum-backward makes local gradients exactly the global-
    batch gradients."""
    params, x = _mixed_cast(params, x, cfg)
    seq_len = x.shape[0]
    b = x.shape[1]
    if axis_name is not None:
        b = b * jax.lax.psum(1, axis_name)
    tm1 = seq_len - 1

    h_all, skips, enc_per_frame = encode_frames(model, params, stats, x,
                                                axis_name, remat=cfg.remat)
    h_pred = lstm_teacher_forced(params["frame_predictor"], h_all[:-1])
    h_target = h_all[1:]

    # GP math (Cholesky/ELBO) at least f32, whatever the conv compute dtype
    gx, gy = _gp_pairs(_f32up(h_all))                   # (T-1, G, B, 1/·)
    elbo_t = jax.vmap(lambda xt, yt: gp_mod.elbo(
        params["gp"], params["likelihood"], xt, yt, num_data=b))(gx, gy)
    max_ll_sum = -jnp.sum(elbo_t)
    gp_mean_t = jax.vmap(
        lambda xt: gp_mod.posterior(params["gp"], xt).mean)(gx)  # (T-1,G,B)
    gp_mean = jnp.swapaxes(gp_mean_t, 1, 2).astype(h_pred.dtype)

    idx = skip_index(seq_len, cfg.n_past, cfg.last_frame_skip)
    latents = jnp.stack([h_pred, h_target, gp_mean])    # (3, T-1, B, G)
    frames, dec_stats = decode_variants(model, params, stats, latents,
                                        skips, idx, axis_name,
                                        remat=cfg.remat)
    # loss terms in (at least) f32 regardless of compute dtype
    frames = _f32up(frames)
    x_true = _f32up(x[1:])
    h_pred32 = _f32up(h_pred)
    h_target32 = _f32up(h_target)
    mse = jnp.mean((frames[0] - x_true) ** 2) * tm1
    ae_mse = jnp.mean((frames[1] - x_true) ** 2) * tm1
    mse_gp = jnp.mean((frames[2] - x_true) ** 2) * tm1
    mse_latent = jnp.mean((h_pred32 - h_target32) ** 2) * tm1
    if axis_name is not None:
        mse, ae_mse, mse_gp, mse_latent, max_ll_sum = jax.tree.map(
            lambda v: jax.lax.pmean(v, axis_name),
            (mse, ae_mse, mse_gp, mse_latent, max_ll_sum))

    loss = (1000.0 * ae_mse + 0.001 * mse + 0.01 * mse_latent
            + 0.001 * mse_gp + 0.0001 * max_ll_sum)

    new_stats = fold_encoder_stats(stats, enc_per_frame, seq_len)
    new_stats["decoder"] = dec_stats
    aux = {
        "stats": new_stats,
        "metrics": {
            "loss": loss, "mse": mse, "ae_mse": ae_mse, "mse_gp": mse_gp,
            "mse_latent": mse_latent, "max_ll": max_ll_sum,
            # reference's printed epoch metric (train.py:248, 368)
            "mse_latent_per_frame": mse_latent / seq_len,
        },
    }
    return loss, aux


def finetune_encode(model: DVGModel, params, stats, x, cfg: DVGConfig,
                    axis_name=None):
    """The ONE encoder sweep shared by both finetune passes.

    train_frame_predictor and train_GP_Frame_predictor each re-encode the
    full sequence (train.py:181-183, 155-156) with IDENTICAL encoder
    parameters (pass 2 steps only the frame_predictor, pass 3 only the GP
    group) and train-mode BN normalizes by *batch* statistics — so their
    latents are bit-identical and both passes stop_gradient them. Encoding
    once deletes a full T-frame conv sweep (~1/5 of the conv work per train
    step) with zero numerics change. Returns (h_all stop-graded, per-frame
    BN stats to fold once per pass)."""
    cparams, cx = _mixed_cast(params, x, cfg)
    h_all, _, enc_per_frame = encode_frames(model, cparams, stats, cx,
                                            axis_name, remat=cfg.remat)
    return jax.lax.stop_gradient(h_all), enc_per_frame


def lstm_finetune_from_h(fp_params, h_all, cfg: DVGConfig, axis_name=None):
    """train_frame_predictor's loss (train.py:175-198): Σ mse_latent over
    precomputed (stop-graded) latents; gradient reaches the frame_predictor
    only (torch deposits encoder grads too but never steps them — the next
    pass's zero_grad discards them)."""
    if cfg.dtype == "bfloat16":
        bf = jnp.bfloat16
        fp_params = jax.tree.map(
            lambda a: a.astype(bf) if a.dtype == jnp.float32 else a,
            fp_params)
    h_pred = lstm_teacher_forced(fp_params, h_all[:-1])
    tm1 = h_all.shape[0] - 1
    mse_latent = jnp.mean((_f32up(h_pred) - _f32up(h_all[1:])) ** 2) * tm1
    if axis_name is not None:
        mse_latent = jax.lax.pmean(mse_latent, axis_name)
    return mse_latent, {"metrics": {"ft_mse_latent": mse_latent}}


def gp_finetune_from_h(gp_group, h_all, num_data: int, axis_name=None):
    """train_GP_Frame_predictor's loss (train.py:146-172): Σ(-ELBO) over
    precomputed latents (h_target detached there, train.py:156; the h input
    gradient never reaches a stepped parameter group either), gradient to
    gp + likelihood only; exact toeplitz-free dense math throughout."""
    gx, gy = _gp_pairs(_f32up(h_all))
    elbo_t = jax.vmap(lambda xt, yt: gp_mod.elbo(
        gp_group["gp"], gp_group["likelihood"], xt, yt,
        num_data=num_data))(gx, gy)
    loss = -jnp.sum(elbo_t)
    if axis_name is not None:
        loss = jax.lax.pmean(loss, axis_name)
    return loss, {"metrics": {"ft_gp_nll": loss}}


# ---------------------------------------------------------------------------
# train state + step
# ---------------------------------------------------------------------------

class TrainState(NamedTuple):
    params: Dict[str, Any]
    stats: Dict[str, Any]
    opt_states: Dict[str, Any]
    step: jnp.ndarray


def init_train_state(cfg: DVGConfig, key) -> Tuple[DVGModel, TrainState,
                                                   Optimizers]:
    model = DVGModel(cfg)
    params, stats = model.init(key)
    opts = make_optimizers(cfg)
    groups = split_params(params)
    opt_states = {name: getattr(opts, name).init(groups[name])
                  for name in groups}
    return model, TrainState(params, stats, opt_states,
                             jnp.zeros((), jnp.int32)), opts


def _apply_group(opts: Optimizers, name: str, grads_group, opt_state,
                 params_group, step):
    opt = getattr(opts, name)
    updates, new_state = opt.update(grads_group, opt_state, params_group)
    return optax.apply_updates(params_group, updates), new_state


def make_train_step_fn(model: DVGModel, cfg: DVGConfig, opts: Optimizers,
                       axis_name=None):
    """The UNJITTED train-step body (state, x) -> (state, metrics): joint
    pass + (optional) two finetune passes, matching the reference's
    per-batch sequence train_model → train_frame_predictor →
    train_GP_Frame_predictor (train.py:358-360, 250-253). Callers jit it
    with whatever shardings they need (make_train_step, __graft_entry__).

    With `axis_name`, the body is shard_map-ready: losses are pmean'd over
    the axis (so their backward psums the gradients) and BN statistics are
    global-batch — identical updates on every device."""

    def step_fn(state: TrainState, x) -> Tuple[TrainState, Dict]:
        params, stats = state.params, state.stats
        opt_states = dict(state.opt_states)
        metrics = {}

        def global_grads(g):
            # AD of the pmean'd loss leaves each device with the global
            # gradient plus a device-local deviation that cancels across the
            # axis; pmean recovers the exact global-batch gradient (verified
            # against the single-device path in test_train.py)
            if axis_name is None:
                return g
            return jax.lax.pmean(g, axis_name)

        # ---- pass 1: joint ------------------------------------------------
        (loss, aux), grads = jax.value_and_grad(
            joint_loss, has_aux=True)(params, stats, x, model, cfg,
                                      axis_name)
        grads = global_grads(grads)
        stats = aux["stats"]
        metrics.update(aux["metrics"])
        g_groups = split_params(grads)
        p_groups = split_params(params)
        for name in g_groups:
            p_groups[name], opt_states[name] = _apply_group(
                opts, name, g_groups[name], opt_states[name],
                p_groups[name], state.step)
        params = merge_params(p_groups)

        if cfg.ft:
            # ---- shared encode for passes 2+3 (identical encoder params,
            # batch-stat BN → bit-identical latents; see finetune_encode) ---
            stats_at_encode = stats
            h_all, enc_per_frame = finetune_encode(model, params, stats, x,
                                                   cfg, axis_name)
            seq_len = x.shape[0]
            b_glob = x.shape[1]
            if axis_name is not None:
                b_glob = b_glob * jax.lax.psum(1, axis_name)

            # ---- pass 2: LSTM-only ---------------------------------------
            (ft_l, aux2), g_fp = jax.value_and_grad(
                lstm_finetune_from_h, has_aux=True)(
                    params["frame_predictor"], h_all, cfg, axis_name)
            g_fp = global_grads(g_fp)
            # the pass's own encoder EMA fold (train.py:181-183 call order)
            stats = fold_encoder_stats(stats, enc_per_frame, seq_len)
            metrics.update(aux2["metrics"])
            fp_new, opt_states["frame_predictor"] = _apply_group(
                opts, "frame_predictor", g_fp,
                opt_states["frame_predictor"], params["frame_predictor"],
                state.step)
            params = dict(params, frame_predictor=fp_new)

            # ---- pass 3: GP-only -------------------------------------------
            gp_group = {"gp": params["gp"], "likelihood": params["likelihood"]}
            (gp_l, aux3), g_gp = jax.value_and_grad(
                gp_finetune_from_h, has_aux=True)(
                    gp_group, h_all, b_glob, axis_name)
            g_gp = global_grads(g_gp)
            # pass 3 re-encodes in torch (train.py:155-156): fold the SAME
            # per-frame stats a second time (sequential EMA telescopes);
            # the raw batch stats must be recovered against the ENCODE-time
            # snapshot, not the post-pass-2 fold
            stats = fold_encoder_stats(stats, enc_per_frame, seq_len,
                                       base_stats=stats_at_encode)
            metrics.update(aux3["metrics"])
            gp_new, opt_states["gp_group"] = _apply_group(
                opts, "gp_group", g_gp, opt_states["gp_group"], gp_group,
                state.step)
            params = dict(params, gp=gp_new["gp"],
                          likelihood=gp_new["likelihood"])

        new_state = TrainState(params, stats, opt_states, state.step + 1)
        return new_state, metrics

    return step_fn


def make_train_step(model: DVGModel, cfg: DVGConfig, opts: Optimizers,
                    mesh=None, batch_axis: str = "data"):
    """Jit the train step. With a `mesh`, the step runs as an explicit
    shard_map over the mesh's batch axis: each device computes on its batch
    shard, losses pmean (→ gradient psum through the backward), BN batch
    statistics pmean to global-batch — exact single-chip numerics at any
    device count, with the collective schedule fully explicit (the SPMD
    partitioner is NOT trusted with the 3-pass conv backward; left alone it
    replicates it)."""
    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        step_fn = make_train_step_fn(model, cfg, opts, axis_name=batch_axis)
        rep_spec, x_spec = P(), P(None, batch_axis)
        sharded = shard_map(step_fn, mesh=mesh,
                            in_specs=(rep_spec, x_spec),
                            out_specs=(rep_spec, rep_spec),
                            check_vma=False)
        return jax.jit(sharded, donate_argnums=(0,))
    return jax.jit(make_train_step_fn(model, cfg, opts), donate_argnums=(0,))
