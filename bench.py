#!/usr/bin/env python
"""Headline benchmark: generated frames/sec/chip on the reference's eval
protocol — BAIR-geometry 64x64 RGB, n_past=5, 100-frame future, 100 sampled
futures per clip, batch 50 (reference generate_frames.py:47-49, 138-178).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

The reference repo publishes no numbers (BASELINE.md), so `vs_baseline` is
measured against a faithful emulation of the reference's execution model on
the SAME chip: a serial per-sample Python loop whose every frame round-trips
device→host (the torch loop's .cpu().numpy() per frame,
generate_frames.py:175-176) and rolls out one sample at a time. Our number
is the single vmapped-scan rollout of all 100 futures.

Env knobs: BENCH_SAMPLES, BENCH_BATCH, BENCH_NEVAL, BENCH_SERIAL_SAMPLES.
"""

import json
import os
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    import dvg_tpu
    dvg_tpu.enable_compilation_cache()

    from dvg_tpu.config import DVGConfig
    from dvg_tpu.generate.rollout import make_rollout_fns
    from dvg_tpu.models.dvg import DVGModel

    nsample = int(os.environ.get("BENCH_SAMPLES", 100))
    batch = int(os.environ.get("BENCH_BATCH", 50))
    n_eval = int(os.environ.get("BENCH_NEVAL", 105))
    n_past = 5

    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    model_name = os.environ.get("BENCH_MODEL", "dcgan")   # dcgan | vgg
    width = int(os.environ.get("BENCH_WIDTH", 64))        # 64 | 128
    cfg = DVGConfig(dataset="bair", channels=3, image_width=width,
                    batch_size=batch, n_past=n_past,
                    n_future=n_eval - n_past, n_eval=n_eval,
                    model=model_name, nsample=nsample, dtype=dtype,
                    use_pallas=use_pallas)
    model = DVGModel(cfg)
    key = jax.random.PRNGKey(0)
    params, stats = model.init(key)
    cache = model.gp_cache(params)
    fns = make_rollout_fns(model, cfg, nsample=nsample)

    # synthetic context clip (content does not affect throughput)
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (n_eval, batch, width, width, 3), jnp.float32)
    x = jax.device_put(x)

    # the full eval protocol: all futures + in-scan SSIM/PSNR on device
    metrics_fn = jax.jit(fns.diverse_metrics)
    out = metrics_fn(params, stats, cache, x, jax.random.PRNGKey(2))
    jax.block_until_ready(out)

    reps = 3
    t0 = time.perf_counter()
    for r in range(reps):
        out = metrics_fn(params, stats, cache, x, jax.random.PRNGKey(3 + r))
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    frames = nsample * (n_eval - n_past) * batch
    fps = frames / dt

    # ---- reference-execution-model emulation (serial, host-synced) ---------
    serial_s = int(os.environ.get("BENCH_SERIAL_SAMPLES", 3))
    single = make_rollout_fns(model, cfg, nsample=1)
    single_j = jax.jit(single.diverse_metrics)
    _ = jax.block_until_ready(single_j(params, stats, cache, x,
                                       jax.random.PRNGKey(9)))
    t0 = time.perf_counter()
    for s in range(serial_s):
        m = single_j(params, stats, cache, x, jax.random.PRNGKey(10 + s))
        # the reference's loop syncs to host every sample (and every frame)
        jax.tree.map(np.asarray, m)
    dt_serial = (time.perf_counter() - t0) / serial_s
    serial_total_fps = (n_eval - n_past) * batch / dt_serial

    rec = {
        "metric": (f"generated frames/sec/chip ({width}x{width} RGB {model_name}, "
                   f"{n_eval - n_past}-future, {nsample}-sample diverse rollout, "
                   f"batch {batch})"),
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / serial_total_fps, 2),
        "detail": {
            "batched_s_per_rollout": round(dt, 4),
            "serial_emulation_fps": round(serial_total_fps, 1),
            "device": str(jax.devices()[0]),
            "dtype": dtype,
        },
    }
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
