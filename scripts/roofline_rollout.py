"""Roofline arithmetic for the HEADLINE rollout step (PERF.md r5).

VERDICT r4 #3 (Missing) asked for the rollout counterpart of
roofline_bn.py: a per-step byte inventory of the merged-batch diverse
scan compared against the measured HBM bandwidth — so the headline
number is either provably near the wall or provably has headroom,
instead of "flat for three rounds".

Three independent estimates of one scan step (S·B = 5000, 64×64×3 bf16,
hoisted decode — the generate/rollout.py `step` body this bounds replaces
/root/reference/generate_frames.py:143-178):

  1. ANALYTIC floor: minimum HBM traffic assuming perfect fusion — every
     conv stage boundary materializes its output once (write) and is read
     once by the next conv; the frozen skip-pre halves are read once per
     step; the SSIM kernel re-reads the frame; the MSE dot reads an f32
     copy. Elementwise ops are assumed fully fused (free). Divided by the
     saxpy-measured achieved bandwidth.
  2. XLA cost analysis of the REAL jitted step (encode + LSTM + GP
     rsample + hoisted decode + in-scan SSIM/PSNR/MSE): reported
     bytes-accessed / measured BW and flops / detected peak; the bound is
     max(bandwidth-bound, compute-bound) since fused regions overlap DMA
     with MXU.
  3. the MEASURED per-step time from the full diverse_metrics program
     (total / n_free).

Run on the real chip. Prints one JSON dict; numbers land in PERF.md.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import dvg_tpu
dvg_tpu.enable_compilation_cache()

from bench import _peak_flops_per_sec
from dvg_tpu.config import DVGConfig
from dvg_tpu.generate.rollout import make_rollout_fns
from dvg_tpu.models import gp as gp_mod
from dvg_tpu.models.dvg import DVGModel
from dvg_tpu.ops.pallas_ssim import ssim_psnr_batch_pallas_cyclic
from dvg_tpu.utils.profiling import sync_fence


def measure_hbm_bw(gib=2, reps=100):
    n = gib * 1024 * 1024 * 1024 // 2
    x = jnp.full((n,), 1.5, jnp.bfloat16)
    f = jax.jit(lambda x: x * jnp.bfloat16(0.9999) + jnp.bfloat16(0.001))
    y = f(x)
    sync_fence(y)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = f(y)
    sync_fence(y)
    dt = (time.perf_counter() - t0) / reps
    return 2 * n * 2 / dt / 1e9


# DCGAN-64 stage-output feature maps (one image, NHWC elems) — conv
# boundaries are where XLA must materialize in HBM at this working-set size
ENC_MAPS = [(32, 32, 64), (16, 16, 128), (8, 8, 256), (4, 4, 512)]
DEC_MAPS = [(4, 4, 512), (8, 8, 256), (16, 16, 128), (32, 32, 64)]
PRE_MAPS = [(8, 8, 256), (16, 16, 128), (32, 32, 64), (64, 64, 3)]
FRAME = (64, 64, 3)


def analytic_floor_bytes(sb):
    e = lambda m: m[0] * m[1] * m[2]
    frame = e(FRAME)
    n = 0
    # encoder: read x_in (the previous step's decoded frame), write+read
    # every stage output (h (90,) is noise at this scale)
    n += frame                               # x_in read
    n += 2 * sum(e(m) for m in ENC_MAPS)     # stage outs: write + read
    # decoder (hoisted): head + stage outputs write+read; final frame write
    n += 2 * sum(e(m) for m in DEC_MAPS)
    n += frame                               # x_out write
    # frozen skip-pre halves: read once per step (they never re-write)
    n += sum(e(m) for m in PRE_MAPS)
    # metrics: the Pallas SSIM kernel re-reads the bf16 frame (gt side is
    # (B,...) cyclic — 1/S of a frame, ignored); the MSE einsum reads an
    # f32 copy of the frame (dot operands materialize: write bf16→f32 copy
    # then read it → 2 passes at f32 = 4 bf16-equivalent passes)
    n += frame                               # SSIM pred read
    n_f32 = 2 * frame                        # MSE f32 copy write + read
    return (n * 2 + n_f32 * 4) * sb          # bf16 = 2 B, f32 = 4 B


def main():
    nsample = int(os.environ.get("BENCH_SAMPLES", 100))
    batch = int(os.environ.get("BENCH_BATCH", 50))
    n_eval, n_past = 105, 5
    sb = nsample * batch
    cfg = DVGConfig(dataset="bair", channels=3, image_width=64,
                    batch_size=batch, n_past=n_past,
                    n_future=n_eval - n_past, n_eval=n_eval,
                    model="dcgan", nsample=nsample, dtype="bfloat16",
                    use_pallas=True)
    model = DVGModel(cfg)
    params, stats = model.init(jax.random.PRNGKey(0))
    cache = model.gp_cache(params)

    bw = measure_hbm_bw()
    peak = _peak_flops_per_sec(jax.devices()[0], "bfloat16")

    # ---- the real jitted step (mirrors diverse_metrics' scan body) --------
    cdtype = jnp.bfloat16
    fold = model.fold_inference_params(params, stats)
    fparams = jax.tree.map(
        lambda a: a.astype(cdtype) if (hasattr(a, "dtype")
                                       and a.dtype == jnp.float32) else a,
        fold)
    ccache = jax.tree.map(lambda a: a.astype(cdtype), cache)
    (_, sk0), _ = model.encode(fparams, stats,
                               jnp.zeros((sb, 64, 64, 3), cdtype),
                               train=False)
    pre_shapes = [p.shape for p in model.decode_skip_pre(fparams, sk0)]

    def one_step(xin, hidden, gt_b, k):
        (h, _), _ = model.encode(fparams, stats, xin, train=False)
        h_pred, hidden = model.predict_latent(fparams, hidden, h)
        samp = model.from_gp_layout(gp_mod.cached_rsample(
            ccache, model.to_gp_layout(h), k))
        y = model.decode_hoisted(fparams, jnp.where(True, samp, h_pred),
                                 [jnp.zeros(s, cdtype) for s in pre_shapes])
        # in-scan metrics, exactly as metrics_of (rollout.py): all three
        # come out of the one Pallas pass since the r5 MSE fold
        s_v, q_v, m_v = ssim_psnr_batch_pallas_cyclic(gt_b, y)
        return y, hidden, (s_v, q_v,
                           m_v.reshape(nsample, batch))

    xin0 = jnp.zeros((sb, 64, 64, 3), cdtype)
    gt0 = jnp.zeros((batch, 64, 64, 3), jnp.float32)
    hid0 = model.lstm_hidden_init(sb, dtype=cdtype)
    compiled = (jax.jit(one_step)
                .lower(xin0, hid0, gt0, jax.random.PRNGKey(0)).compile())
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    step_flops = float(cost.get("flops", 0.0))
    step_bytes = float(cost.get("bytes accessed", 0.0))

    # ---- measured per-step from the full program --------------------------
    fns = make_rollout_fns(model, cfg, nsample=nsample)
    x = jax.device_put(jax.random.uniform(
        jax.random.PRNGKey(1), (n_eval, batch, 64, 64, 3), jnp.float32))
    metrics_fn = jax.jit(fns.diverse_metrics)
    out = metrics_fn(params, stats, cache, x, jax.random.PRNGKey(2))
    sync_fence(out)
    dt = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        out = metrics_fn(params, stats, cache, x, jax.random.PRNGKey(3 + r))
        sync_fence(out)
        dt = min(dt, time.perf_counter() - t0)
    measured_ms = dt / (n_eval - n_past) * 1e3

    floor = analytic_floor_bytes(sb)
    floor_ms = floor / (bw * 1e9) * 1e3
    xla_bw_ms = step_bytes / (bw * 1e9) * 1e3
    xla_fl_ms = (step_flops / peak * 1e3) if peak else None
    xla_bound_ms = max(xla_bw_ms, xla_fl_ms or 0.0)
    print(json.dumps({
        "hbm_bw_GBs": round(bw, 1),
        "peak_flops_Ts": round(peak / 1e12, 1) if peak else None,
        "analytic_floor_GB_per_step": round(floor / 1e9, 3),
        "analytic_floor_ms": round(floor_ms, 2),
        "xla_step_bytes_GB": round(step_bytes / 1e9, 3),
        "xla_step_flops_G": round(step_flops / 1e9, 2),
        "xla_bandwidth_ms": round(xla_bw_ms, 2),
        "xla_compute_ms": round(xla_fl_ms, 2) if xla_fl_ms else None,
        "xla_bound_ms": round(xla_bound_ms, 2),
        "measured_ms_per_step": round(measured_ms, 2),
        "measured_vs_xla_bound": round(measured_ms / xla_bound_ms, 3),
        "measured_vs_analytic_floor": round(measured_ms / floor_ms, 3),
    }, indent=1))


if __name__ == "__main__":
    main()
