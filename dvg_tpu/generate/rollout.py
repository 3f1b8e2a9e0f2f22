"""Batched rollout engine: posterior, diverse-sample, and GP-trigger paths.

Reference behaviors reproduced (/root/reference/generate_frames.py):

  * **context phase** (115-127 / 152-163): frames 1..n_past-1 are teacher
    forced; the LSTM is fed the encoding of each ground-truth frame to warm
    its hidden state; the U-Net skip connections are captured from the LAST
    encode performed while i < n_past — i.e. from frame n_past-2 — and then
    frozen for the whole free-run (the "stale-skip" semantics).
  * **posterior rollout** (111-134): every free-run step decodes the GP
    posterior MEAN of gp(h_pred) where h_pred = LSTM(enc(x_in)).
  * **diverse rollout** (143-178): per sample, each free-run step decodes
    the LSTM prediction, EXCEPT on the fixed fork schedule (i % 15 == 0)
    where it decodes a reparameterized SAMPLE of likelihood(gp(h)) — note
    the GP input is h = enc(x_in), not h_pred (generate_frames.py:168-170).
    The reference loops the 100 samples serially on host; here all S
    samples are one `vmap` over the scan.
  * **train-time plot rollout** (train.py:256-289): same as diverse but the
    fork happens at exactly i == 10.
  * **GP-trigger rollout** (`GPtrigger_gen`, 249-300): NO teacher forcing —
    free-runs from x[0]; skips are captured from the encodes of the first 5
    (generated) inputs and then frozen; a 12-step warmup fills a rolling
    window of GP predictive-variance norms; afterwards a step forks to a GP
    sample whenever value > mean(window) + (2 + 0.01·depth)·std(window)
    (`depth` never increments in the reference → the 2.01σ constant).
    On triggered steps the reference's branch never calls the
    frame_predictor (generate_frames.py:286-291) — the LSTM hidden stays
    stale there; reproduced per-row.
    The reference computes the variance norm for a single hardcoded batch
    row (index [3] at generate_frames.py:230 vs the loop index at 275) and
    loops rows serially; here every batch row carries its own rolling
    window and triggers independently — one scan for the whole batch
    (documented vectorization of the reference's quirk).

Everything here takes a `GPCache` (precomputed Cholesky/solve products,
models/gp.py) so the scanned hot loop does only small matmuls — no
factorizations inside the scan.

Sampling nuance: the reference's `.rsample()` draws one sample of a
MultivariateNormal over the BATCH axis (correlated across batch rows via
the full B×B covariance). Batch rows are independent videos, so we sample
from the per-row marginal (mean, var + noise) — statistically the intended
behavior and the TPU-fast path (see models/gp.py:rsample docstring).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dvg_tpu.config import DVGConfig
from dvg_tpu.models import gp as gp_mod
from dvg_tpu.models.dvg import DVGModel
from dvg_tpu.ops import ssim as ssim_ops


class RolloutFns(NamedTuple):
    """Jitted generation entry points, all pure functions of
    (params, stats, gp_cache, inputs...)."""
    posterior: Callable      # (params, stats, cache, x) -> (T, B, H, W, C)
    diverse: Callable        # (params, stats, cache, x, key) -> (S, T, B, ...)
    diverse_metrics: Callable  # (params, stats, cache, x, key) ->
    #   {"ssim","psnr","mse": (S, n_free, B)} — metrics computed INSIDE the
    #   scan; frames never materialize (100x104x50 frames would be tens of
    #   GB — the reference pays this as 520k serial host round-trips)
    diverse_select: Callable  # (..., x, key, ids (K,)) -> (K, n_eval, B, ...)
    #   exact re-rollout of chosen samples: per-sample PRNG keys derive from
    #   `key` by sample index, so re-rolling ids reproduces those futures
    diverse_select_pairs: Callable  # (..., x_sel (T,K,...), base_keys (K,),
    #   row_ids (K,)) -> (n_eval, K, H, W, C): ONE rollout where batch
    #   position k replays (sample base_keys[k], global row row_ids[k]) —
    #   the whole GIF re-roll in a single dispatch
    diverse_rollout_with_keys: Callable  # (..., x, base_keys (K,),
    #   row_ids (B,)) -> (K, n_eval, B, ...): full-batch re-roll of chosen
    #   sample keys (the --full_cov-exact selection path)
    plot_samples: Callable   # train-time 5-sample, fork@10 (train.py:281)
    gp_trigger: Callable     # (params, stats, cache, x, key) -> frames, diag


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------

def _context_phase(model: DVGModel, params, stats, x, n_past: int):
    """Teacher-forced warmup. x: (T, B, H, W, C).

    Returns (hidden after feeding h(x[0..n_past-2]), frozen skip list from
    frame n_past-2, x_in = x[n_past-1])."""
    b = x.shape[1]
    ctx = x[:n_past]                      # frames 0..n_past-1

    def enc(xt):
        (h, skips), _ = model.encode(params, stats, xt, train=False)
        return h, skips

    h_ctx, skips_ctx = jax.vmap(enc)(ctx)           # (n_past, B, G), stages
    hidden = model.lstm_hidden_init(b, dtype=h_ctx.dtype)

    def warm(hidden, h_t):
        _, hidden = model.predict_latent(params, hidden, h_t)
        return hidden, None

    # the loop feeds h(x[i-1]) for i = 1..n_past-1 (x_in lags one frame)
    hidden, _ = jax.lax.scan(warm, hidden, h_ctx[:n_past - 1])
    skip = [s[max(n_past - 2, 0)] for s in skips_ctx]
    return hidden, skip, x[n_past - 1]


def _free_run(model: DVGModel, params, stats, cache: gp_mod.GPCache,
              hidden, skip, x_in, n_steps: int, fork_mask, keys,
              gp_mean_mode: bool, row_ids=None,
              refresh_skip: bool = False, full_cov: bool = False,
              pair_keys: bool = False, cache_fc: gp_mod.GPCache = None):
    """Closed-loop rollout for n_steps frames → (n_steps, B, H, W, C).

    fork_mask: (n_steps,) bool — steps that decode a GP sample of gp(h).
    gp_mean_mode: True → every step decodes the GP posterior mean of
    gp(h_pred) (the posterior rollout); False → LSTM prediction decodes
    unless forked.
    refresh_skip (--last_frame_skip, generate_frames.py:116-119): the skip
    features refresh from the encode of EVERY input frame — including the
    model's own generated frames — instead of staying frozen at the last
    context frame.
    full_cov (--full_cov): forked steps draw the reference-exact
    batch-correlated sample (generate_frames.py:170) — key-only, so
    `row_ids` replay applies only to the default marginal mode.
    pair_keys: `keys` is (n_steps, K) — every batch position k is its own
    (sample, row) pair with its own step keys (batched GIF re-roll).

    (In-scan SSIM/PSNR eval lives in `diverse_metrics`'s merged-batch scan,
    not here — this function always materializes frames.)"""
    assert not (full_cov and pair_keys), (
        "pair replay is marginal-only (diverse_select_pairs raises first)")

    def enc_full(xt):
        (h, skips), _ = model.encode(params, stats, xt, train=False)
        return h, skips

    # frozen skips → the skip half of every decoder conv is loop-invariant:
    # precompute it once (model.decode_skip_pre) instead of paying ~half the
    # decoder FLOPs every scan step. Computed here (not per caller) so every
    # frozen-skip path — posterior, diverse, select/pairs re-rolls — hoists
    # identically; under the per-sample vmap the skips are unbatched closure
    # values, so this traces ONCE, not per sample.
    skip_pre = None if refresh_skip else jax.lax.optimization_barrier(
        model.decode_skip_pre(params, skip))

    def step(carry, scan_in):
        hidden, x_in = carry
        fork, key = scan_in
        h, skips_new = enc_full(x_in)
        h_pred, hidden = model.predict_latent(params, hidden, h)
        if gp_mean_mode:
            mean, _ = gp_mod.cached_mean_var(cache, model.to_gp_layout(h_pred))
            latent = model.from_gp_layout(mean)
        else:
            if full_cov:
                # fork is a scan-carried scalar (and stays UNBATCHED under
                # the per-sample vmap), so lax.cond runs the expensive
                # (D,B,B) covariance + Cholesky only on actual fork steps;
                # jnp.where would evaluate it every step
                latent = jax.lax.cond(
                    fork,
                    lambda: model.from_gp_layout(gp_mod.cached_rsample_fullcov(
                        cache_fc if cache_fc is not None else cache,
                        model.to_gp_layout(h), key)),
                    lambda: h_pred)
            else:
                if pair_keys:
                    sample = gp_mod.cached_rsample_pairs(
                        cache, model.to_gp_layout(h), key, row_ids)
                else:
                    sample = gp_mod.cached_rsample(
                        cache, model.to_gp_layout(h), key, row_ids=row_ids)
                latent = jnp.where(fork, model.from_gp_layout(sample), h_pred)
        if refresh_skip:
            x_out, _ = model.decode(params, stats, latent, skips_new,
                                    train=False)
        else:
            x_out = model.decode_hoisted(params, latent, skip_pre)
        return (hidden, x_out), x_out

    (_, _), out = jax.lax.scan(step, (hidden, x_in), (fork_mask, keys))
    return out


# ---------------------------------------------------------------------------
# entry points
# ---------------------------------------------------------------------------

def make_rollout_fns(model: DVGModel, cfg: DVGConfig,
                     nsample: int = None) -> RolloutFns:
    """cfg.dtype='bfloat16' runs the conv/LSTM/GP compute in bf16 (2x MXU
    throughput, the production inference dtype); in-scan SSIM/PSNR and the
    returned frames stay float32."""
    n_past, n_eval = cfg.n_past, cfg.n_eval
    n_free = n_eval - n_past
    nsample = nsample if nsample is not None else cfg.nsample
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    refresh = bool(cfg.last_frame_skip)   # generate_frames.py:116-119
    fc = bool(getattr(cfg, "full_cov_sampling", False))

    def cast_tree(tree):
        if dtype == jnp.float32:
            return tree
        return jax.tree.map(
            lambda a: a.astype(dtype)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, tree)

    def prep(params, stats, cache):
        """Entry-point preamble: fold eval-mode BN into the conv weights
        (f32 math), then cast everything to the rollout compute dtype.

        Also returns the UNCAST (f32) cache: the batch-correlated draw
        (--full_cov) must factorize a covariance assembled from f32-
        consistent GP parameters — a bf16-rounded cache makes w/v2
        inconsistent with the kernel, the cancellation kxx − a·aᵀ leaves
        residuals above noise+jitter, and the (D,B,B) Cholesky goes NaN
        (models/gp.py::cached_rsample_fullcov). The marginal hot path keeps
        the cast cache (its variance is clamped, bf16-safe)."""
        params = model.fold_inference_params(params, stats)
        return cast_tree(params), cast_tree(stats), cast_tree(cache), cache

    # fork schedules over free-run steps i = n_past..n_eval-1
    steps = np.arange(n_past, n_eval)
    fork_15 = jnp.asarray(steps % 15 == 0)           # generate_frames.py:167
    fork_10 = jnp.asarray(steps == 10)               # train.py:281
    no_fork = jnp.zeros((n_free,), bool)

    def posterior(params, stats, cache, x):
        params, stats, cache, _ = prep(params, stats, cache)
        x = x.astype(dtype)
        hidden, skip, x_in = _context_phase(model, params, stats, x, n_past)
        keys = jax.random.split(jax.random.PRNGKey(0), n_free)  # unused
        frames = _free_run(model, params, stats, cache, hidden, skip, x_in,
                           n_free, no_fork, keys, gp_mean_mode=True,
                           refresh_skip=refresh)
        return jnp.concatenate([x[:n_past], frames],
                               axis=0).astype(jnp.float32)

    def _sampled(params, stats, cache, x, key, fork_mask, s, row_ids=None):
        rows = (jnp.arange(x.shape[1]) if row_ids is None
                else jnp.asarray(row_ids))
        return _sampled_with_keys(params, stats, cache, x,
                                  jax.random.split(key, s), fork_mask, rows)

    def diverse(params, stats, cache, x, key):
        return _sampled(params, stats, cache, x, key, fork_15, nsample)

    def diverse_metrics(params, stats, cache, x, key, row_offset=0):
        """All-sample eval with in-scan metrics, no frame materialization.
        Returns {"ssim","psnr","mse"}: (S, n_free, B).

        All S futures run as ONE scan over a merged (S·B) batch axis instead
        of vmap-of-scan — XLA's vmap batching inserts per-step reshapes/
        copies of every conv activation, which profiled at ~25% of rollout
        time. PRNG derivation is bit-identical to `diverse`/`diverse_select`:
        per-sample step keys split from `key` by sample index, per-row noise
        folded by global row id (tested frame-exact against `diverse`).

        `row_offset` shifts the per-row noise ids — a batch-sharded caller
        (2-D ('sample','data') mesh, parallel/mesh.py) passes its shard's
        global row start so noise stays a function of the GLOBAL row, and
        `diverse_select` re-rolls scored futures with plain global ids."""
        gt = x[n_past:n_eval].astype(jnp.float32)   # metrics vs f32 truth
        metric = getattr(cfg, "eval_metric", "skimage")
        params, stats, cache, cache_fc = prep(params, stats, cache)
        x = x.astype(dtype)
        hidden_b, skip_b, x_in_b = _context_phase(model, params, stats, x,
                                                  n_past)
        b = x.shape[1]
        s_n = nsample

        def tile(a):                                 # (B, ...) → (S·B, ...)
            return jnp.tile(a, (s_n,) + (1,) * (a.ndim - 1))

        hidden = jax.tree.map(lambda a: jnp.tile(a, (1, s_n, 1)), hidden_b)
        x_in = tile(x_in_b)
        if refresh:
            # --last_frame_skip: skips regenerate from every frame, nothing
            # is loop-invariant — materialize the tiled skips ONCE (without
            # the barrier XLA rematerializes the broadcasts inside the scan
            # body: ~6.5 ms/step of pure HBM writes, PERF.md)
            skip = jax.lax.optimization_barrier([tile(sk) for sk in skip_b])
            skip_pre = None
        else:
            # frozen skips: hoist the skip half of every decoder conv out of
            # the scan (~half the decoder FLOPs per step), computed at the
            # un-tiled (B) batch, then TILED ONCE to (S·B) — the in-scan add
            # is then shape-equal and fuses into the convT output. Keeping
            # the pre at (B) and broadcast-adding inside the scan measured
            # SLOWER than the old fused decode (19.3 vs 15.4 ms/step: the
            # 5-D reshape-broadcast breaks the output fusion); the tiled
            # form measured 10.0 ms/step (PERF.md r5). Barrier for the same
            # reason as the tiled skips above.
            skip = None
            skip_pre = jax.lax.optimization_barrier(
                [tile(p) for p in model.decode_skip_pre(params, skip_b)])
        step_keys = jnp.swapaxes(jax.vmap(
            lambda k: jax.random.split(k, n_free)
        )(jax.random.split(key, s_n)), 0, 1)          # (n_free, S)
        rows = row_offset + jnp.arange(b)

        if metric == "finn" or cfg.use_pallas:
            pre = {"gt": gt}
        else:
            flat = gt.reshape((n_free * b,) + gt.shape[2:])
            pre = ssim_ops.ssim_gt_precompute(flat)
            pre = jax.tree.map(
                lambda a: a.reshape((n_free, b) + a.shape[1:]), pre)

        def metrics_of(x_out, pre_t):
            """x_out (S·B, H, W, C) vs gt-side pre (B, ...) → (S, B) each."""
            gt_t = pre_t["gt"]
            if cfg.use_pallas and metric != "finn":
                # cyclic gt indexing: the (B,...) ground truth never tiles
                # to (S·B,...) in HBM. The pred goes in at the rollout's
                # compute dtype — it was produced in that dtype, so the f32
                # upcast adds no information and the NHWC→images transpose
                # moves half the bytes; the kernel upcasts per-VMEM-block.
                # MSE comes out of the SAME kernel pass (it already computes
                # Σ(x−g)² for PSNR) — no f32 frame copy, no einsum, and the
                # direct difference form is numerically better than the
                # expanded Σx²−2xg+Σg² below at trained-model MSE scale.
                from dvg_tpu.ops.pallas_ssim import ssim_psnr_batch_pallas_cyclic
                s_v, q_v, m_v = ssim_psnr_batch_pallas_cyclic(gt_t, x_out)
                return (s_v.reshape(s_n, b), q_v.reshape(s_n, b),
                        m_v.reshape(s_n, b))
            x_out = x_out.astype(jnp.float32)
            if metric == "finn":
                s_v, q_v = ssim_ops.finn_ssim_psnr_batch(tile(gt_t), x_out)
            else:
                pre_tiled = jax.tree.map(tile, pre_t)
                s_v, q_v = ssim_ops.ssim_psnr_batch_pre(pre_tiled, x_out)
            # MSE without materializing the (S, B, HWC) broadcast of gt:
            # mean((x-g)²) = (Σx² - 2·x·g + Σg²)/F — the cross term is one
            # MXU dot_general batched over rows; profiled ~4 ms/step cheaper
            # than the broadcast-subtract form (which also dragged a full
            # f32 gt copy into the decoder's output fusion).
            # PRECISION TRADEOFF: the expanded form subtracts large
            # near-equal f32 sums, so for a WELL-TRAINED model (MSE ≪ E[x²],
            # i.e. ≲1e-3 at these frame norms) the relative error grows to
            # ~1e-3–1e-2 of the MSE — fine for best-of-N ranking (selection
            # uses SSIM) and logging, but use the subtract form if MSE ever
            # becomes a reported headline metric at convergence scale.
            # tests/test_metrics.py::test_einsum_mse_low_mse_regime bounds
            # the drift at trained-model MSE scale. (The Pallas path above
            # avoids the tradeoff entirely via the in-kernel direct form.)
            f = x_out.shape[1] * x_out.shape[2] * x_out.shape[3]
            xs = x_out.reshape(s_n, b, f)
            gs = gt_t.reshape(b, f)
            cross = jnp.einsum("sbf,bf->sb", xs, gs,
                               preferred_element_type=jnp.float32)
            m_v = (jnp.sum(xs * xs, axis=-1) - 2.0 * cross
                   + jnp.sum(gs * gs, axis=-1)[None]) / f
            return s_v.reshape(s_n, b), q_v.reshape(s_n, b), m_v

        def step(carry, scan_in):
            hidden, x_in = carry
            fork, keys_t, pre_t = scan_in
            (h, skips_new), _ = model.encode(params, stats, x_in, train=False)
            h_pred, hidden = model.predict_latent(params, hidden, h)
            hs = h.reshape(s_n, b, -1)

            def samp(k_s, h_s):
                if fc:     # reference-exact correlated draw, key-only
                    y = gp_mod.cached_rsample_fullcov(
                        cache_fc, model.to_gp_layout(h_s), k_s)
                else:
                    y = gp_mod.cached_rsample(cache, model.to_gp_layout(h_s),
                                              k_s, row_ids=rows)
                return model.from_gp_layout(y)

            if fc:
                # the (D,B,B) covariance assembly + batched Cholesky of the
                # correlated draw is expensive and only ~1 step in 15 uses
                # it; `fork` is a scan-carried scalar (uniform over the
                # batch), so lax.cond executes ONE branch per step instead
                # of jnp.where's both. The marginal hot path keeps the
                # branch-free where (its draw is a few small matmuls —
                # cheaper than a conditional in the tuned headline scan).
                latent = jax.lax.cond(
                    fork,
                    lambda: jax.vmap(samp)(keys_t, hs).reshape(s_n * b, -1),
                    lambda: h_pred)
            else:
                sample = jax.vmap(samp)(keys_t, hs).reshape(s_n * b, -1)
                latent = jnp.where(fork, sample, h_pred)
            if refresh:
                x_out, _ = model.decode(params, stats, latent, skips_new,
                                        train=False)
            else:
                x_out = model.decode_hoisted(params, latent, skip_pre)
            return (hidden, x_out), metrics_of(x_out, pre_t)

        (_, _), (s_v, q_v, m_v) = jax.lax.scan(
            step, (hidden, x_in), (fork_15, step_keys, pre))
        # (n_free, S, B) → (S, n_free, B)
        out = {"ssim": s_v, "psnr": q_v, "mse": m_v}
        return jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), out)

    def diverse_select(params, stats, cache, x, key, sample_ids, row_ids):
        """Re-roll only the chosen sample ids on a slice of batch rows.

        Exactly reproduces the futures scored by diverse_metrics: per-sample
        keys split from `key` by sample index, per-row noise folded by the
        GLOBAL row id (pass the rows' original indices in `row_ids`)."""
        if fc:
            raise ValueError(
                "diverse_select cannot reproduce scored futures under "
                "cfg.full_cov_sampling: the correlated draw spans the FULL "
                "eval batch, so a row subset (or even the same rows "
                "reordered) changes the sample. Re-roll the whole batch "
                "with diverse_rollout_with_keys instead (cli/generate.py "
                "does exactly this).")
        all_keys = jax.random.split(key, nsample)
        sel = jnp.take(all_keys, sample_ids, axis=0)
        return _sampled_with_keys(params, stats, cache, x, sel, fork_15,
                                  row_ids)

    def _sampled_with_keys(params, stats, cache, x, sample_keys, fork_mask,
                           row_ids):
        params, stats, cache, cache_fc = prep(params, stats, cache)
        x = x.astype(dtype)
        hidden, skip, x_in = _context_phase(model, params, stats, x, n_past)
        rows = jnp.asarray(row_ids)

        def one(k):
            keys = jax.random.split(k, n_free)
            return _free_run(model, params, stats, cache, hidden, skip, x_in,
                             n_free, fork_mask, keys, gp_mean_mode=False,
                             row_ids=rows, refresh_skip=refresh,
                             full_cov=fc, cache_fc=cache_fc)

        frames = jax.vmap(one)(sample_keys)
        k = sample_keys.shape[0]
        ctx = jnp.broadcast_to(x[None, :n_past], (k,) + x[:n_past].shape)
        return jnp.concatenate([ctx, frames], axis=1).astype(jnp.float32)

    def diverse_rollout_with_keys(params, stats, cache, x, base_keys,
                                  row_ids):
        """Full-batch re-roll of explicitly-keyed samples — with
        cfg.full_cov_sampling this reproduces the correlated draws the
        metrics pass scored (the correlated eps spans the whole batch, so
        the re-roll must too)."""
        return _sampled_with_keys(params, stats, cache, x, base_keys,
                                  fork_15, row_ids)

    def diverse_select_pairs(params, stats, cache, x_sel, base_keys,
                             row_ids):
        """ONE K-batch rollout replaying K (sample, row) pairs.

        x_sel: (T, K, H, W, C) where column k is the clip of global batch
        row row_ids[k]; base_keys[k] is that pair's sample key (split from
        the eval key by sample index — or the sharded translation thereof).
        Marginal sampling only: eval-mode encode/decode and the per-row
        noise derivation are batch-position independent, so column k
        reproduces exactly what (sample, row) saw in diverse_metrics.
        Replaces the per-pair host loop of dispatches (K jit calls → 1)."""
        if fc:
            raise ValueError(
                "diverse_select_pairs replays per-row MARGINAL draws only; "
                "under cfg.full_cov_sampling the scored draw was correlated "
                "across the whole batch — re-roll with "
                "diverse_rollout_with_keys on the full batch instead "
                "(cli/generate.py does exactly this).")
        params, stats, cache, _ = prep(params, stats, cache)
        x_sel = x_sel.astype(dtype)
        hidden, skip, x_in = _context_phase(model, params, stats, x_sel,
                                            n_past)
        step_keys = jnp.swapaxes(jax.vmap(
            lambda k: jax.random.split(k, n_free))(base_keys), 0, 1)
        frames = _free_run(model, params, stats, cache, hidden, skip, x_in,
                           n_free, fork_15, step_keys, gp_mean_mode=False,
                           row_ids=jnp.asarray(row_ids),
                           refresh_skip=refresh, pair_keys=True)
        return jnp.concatenate([x_sel[:n_past], frames],
                               axis=0).astype(jnp.float32)

    def plot_samples(params, stats, cache, x, key):
        return _sampled(params, stats, cache, x, key, fork_10, 5)

    # -- GP-trigger adaptive path (generate_frames.py:249-300) ---------------
    warmup = 12
    total = n_eval                                      # 105 by default

    def gp_trigger(params, stats, cache, x, key):
        # Contract: the reference's warmup is FIXED at 12 frames
        # (generate_frames.py:266-279) and the triggered loop is
        # `for i in range(12, 105)` — with n_eval == 12 that loop is
        # simply empty, so a warmup-only rollout (12 deterministic
        # frames, no triggers) is a legal, well-defined geometry and the
        # minimal one the serving tests export. Only n_eval < 12 is
        # rejected: a truncated threshold window has no reference meaning
        # (the 12-value rolling-stats seed would be short).
        if total < warmup:
            raise ValueError(
                f"gp_trigger needs n_eval >= {warmup} (the reference's "
                f"fixed {warmup}-step free-run warmup that seeds the "
                "rolling threshold window, generate_frames.py:266-283) "
                f"but cfg.n_eval={total}")
        params, stats, cache, cache_fc = prep(params, stats, cache)
        x = x.astype(dtype)
        b = x.shape[1]

        def enc(xt):
            (h, skips), _ = model.encode(params, stats, xt, train=False)
            return h, skips

        def var_norm(h):
            v = gp_mod.cached_variance(cache, model.to_gp_layout(h))  # (G,B)
            return jnp.linalg.norm(v.astype(jnp.float32), axis=0)     # (B,)

        hidden = model.lstm_hidden_init(b, dtype=x.dtype)
        x_in = x[0]
        keys = jax.random.split(key, total)

        # warmup: free-run 12 frames, skip frozen from the first 5 encodes
        # (generate_frames.py:266-271); collect variance norms. One scan —
        # a Python-unrolled loop inlines 12 encoder+decoder copies into the
        # program and multiplies compile time ~4x
        window0 = jnp.zeros((warmup, b), jnp.float32)
        _, skips0 = enc(x_in)
        skip0 = [jnp.zeros_like(s) for s in skips0]  # overwritten at i=0

        def warm_step(carry, i):
            hidden, x_in, window, skip = carry
            h, skips_i = enc(x_in)
            # reference updates the skip BEFORE decoding while i < 5
            skip = [jnp.where(i < 5, s_new, s_old)
                    for s_new, s_old in zip(skips_i, skip)]
            window = window.at[i].set(var_norm(h))
            h_pred, hidden = model.predict_latent(params, hidden, h)
            x_out, _ = model.decode(params, stats, h_pred, skip, train=False)
            return (hidden, x_out, window, skip), x_out

        (hidden, x_in, window, skip), frames_w = jax.lax.scan(
            warm_step, (hidden, x_in, window0, skip0), jnp.arange(warmup))

        # the skip set is frozen after warmup (reference captures it from
        # the first 5 encodes only) — hoist its decoder-conv half out of
        # the 93-step triggered scan, as in the diverse path
        skip_pre = jax.lax.optimization_barrier(
            model.decode_skip_pre(params, skip))

        def step(carry, scan_in):
            hidden, x_in, window = carry
            k = scan_in
            h, _ = enc(x_in)
            value = var_norm(h)                          # (B,)
            window = jnp.concatenate([window[1:], value[None]], axis=0)
            # reference: mean + 2.01·std (depth frozen at 1); the sigma
            # multiple and absolute margin are config knobs whose defaults
            # reproduce that exactly (config.py trigger_sigma/-margin)
            thresh = (jnp.mean(window, axis=0)
                      + cfg.trigger_sigma * jnp.std(window, axis=0)
                      - cfg.trigger_margin)
            h_pred, hidden_new = model.predict_latent(params, hidden, h)
            # the reference's trigger branch draws the batch-correlated
            # gpytorch .rsample() (generate_frames.py:292) — honor
            # --full_cov here exactly as the diverse path does
            if fc:
                raw = gp_mod.cached_rsample_fullcov(
                    cache_fc, model.to_gp_layout(h), k)
            else:
                raw = gp_mod.cached_rsample(cache, model.to_gp_layout(h), k)
            sample = model.from_gp_layout(raw)
            trig = (value > thresh)[:, None]             # (B, 1)
            latent = jnp.where(trig, sample, h_pred)
            # the reference's trigger branch (generate_frames.py:286-291)
            # never calls frame_predictor — the LSTM hidden stays STALE on
            # triggered rows (only `generation()` advances it); verified
            # against the torch-executed verbatim control flow in
            # tests/test_trained_model_parity.py
            hidden = jax.tree.map(
                lambda old, new: jnp.where(trig[None], old, new),
                hidden, hidden_new)
            x_out = model.decode_hoisted(params, latent, skip_pre)
            return (hidden, x_out, window), (x_out, trig[:, 0], value)

        (_, _, _), (frames_t, trig, values) = jax.lax.scan(
            step, (hidden, x_in, window), keys[warmup:total])
        frames = jnp.concatenate([frames_w, frames_t], axis=0)
        return frames.astype(jnp.float32), {"triggers": trig,
                                            "values": values,
                                            "warmup_values": window}

    return RolloutFns(posterior=posterior, diverse=diverse,
                      diverse_metrics=diverse_metrics,
                      diverse_select=diverse_select,
                      diverse_select_pairs=diverse_select_pairs,
                      diverse_rollout_with_keys=diverse_rollout_with_keys,
                      plot_samples=plot_samples, gp_trigger=gp_trigger)


# ---------------------------------------------------------------------------
# best-of-N selection (generate_frames.py:138-143, 188-189)
# ---------------------------------------------------------------------------

def best_of_n(metric_bt_per_sample: jnp.ndarray) -> Tuple[jnp.ndarray,
                                                          jnp.ndarray]:
    """metric (B, S, T) → (best sample index per batch row by mean-over-T,
    the per-row best mean). Matches `ordered[-1]` selection."""
    mean_bs = jnp.mean(metric_bt_per_sample, axis=-1)   # (B, S)
    # The reference takes `ordered[-1]` of np.argsort whose default kind
    # (quicksort) is UNSTABLE, so its tie order is unspecified; last-max
    # index is our deterministic convention — it equals ordered[-1]
    # whenever the means are distinct (the practical case).
    s = mean_bs.shape[-1]
    idx = (s - 1) - jnp.argmax(mean_bs[..., ::-1], axis=-1)
    return idx, jnp.take_along_axis(mean_bs, idx[:, None], axis=1)[:, 0]
