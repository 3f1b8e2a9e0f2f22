#!/usr/bin/env python
"""Headline benchmark: generated frames/sec/chip on the reference's eval
protocol — BAIR-geometry 64x64 RGB, n_past=5, 100-frame future, 100 sampled
futures per clip, batch 50 (reference generate_frames.py:47-49, 138-178).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

The reference repo publishes no numbers (BASELINE.md), so `vs_baseline`
measures against an emulation of the reference's execution model on the
SAME chip: one sample at a time, one frame at a time, each frame a separate
device call synced before the next (the torch loop, generate_frames.py:
143-178). `vs_baseline` uses the conservative variant (frames chained by
data dependence, one-frame-at-a-time dispatch, no host copies — the most
favorable reading of the reference's loop); `detail` also reports the
faithful variant including the reference's per-frame .cpu().numpy()
round-trips (generate_frames.py:175-176). Our number is one merged-batch
scan over all futures.

Env knobs: BENCH_SAMPLES, BENCH_BATCH, BENCH_NEVAL, BENCH_SERIAL_SAMPLES.
"""

import json
import os
import sys
import time

import numpy as np


def _peak_flops_per_sec(device, dtype: str):
    """Per-chip peak for the MFU denominator, by detected device kind.
    Returns None (→ MFU omitted) on devices not in the table rather than
    silently dividing by the wrong accelerator's peak."""
    kind = str(getattr(device, "device_kind", "")).lower()
    bf16_peaks = [            # ordered: more-specific prefixes first
        ("tpu v6 lite", 918e12),     # v6e (Trillium)
        ("tpu v6", 918e12),
        ("tpu v5 lite", 197e12),     # v5e
        ("tpu v5p", 459e12),
        ("tpu v5", 459e12),
        ("tpu v4", 275e12),
        ("tpu v3", 123e12),
    ]
    for prefix, peak in bf16_peaks:
        if kind.startswith(prefix):
            return peak if dtype == "bfloat16" else peak / 2.0
    return None


def _sync(out):
    """The shared tunnel-proof completion fence (see its docstring)."""
    from dvg_tpu.utils.profiling import sync_fence

    return sync_fence(out)


def _measure_train(width: int, model_name: str, dtype: str) -> dict:
    """The full 3-pass training step (joint + LSTM-ft + GP-ft) at the
    reference's training geometry: batch 50, n_past 5, n_future 10."""
    import jax
    import jax.numpy as jnp

    from dvg_tpu.config import DVGConfig
    from dvg_tpu.train.step import init_train_state, make_train_step_fn

    # 128-px training needs rematerialized conv sweeps to fit HBM (same as
    # the CLI's --remat); batch scales down like the reference's 128 runs
    tbatch = int(os.environ.get("BENCH_TRAIN_BATCH",
                                50 if width == 64 else 8))
    tcfg = DVGConfig(dataset="bair", channels=3, image_width=width,
                     batch_size=tbatch,
                     n_past=5, n_future=10, n_eval=15,
                     model=model_name, dtype=dtype, remat=(width > 64))
    tmodel, tstate, topts = init_train_state(tcfg, jax.random.PRNGKey(4))
    tstep = jax.jit(make_train_step_fn(tmodel, tcfg, topts))
    xt = jax.random.uniform(jax.random.PRNGKey(5),
                            (15, tcfg.batch_size, width, width, 3),
                            jnp.float32)
    tstate, _ = tstep(tstate, xt)
    _sync(tstate.params)
    # sustained (pipelined) step time: enqueue a window of steps and block
    # once — matches how the CLI drives the chip (per-step sync would bill
    # the host→device dispatch round-trip to every step). Best of 3
    # windows: the tunnel's host-side enqueue latency wanders by several
    # ms run-to-run; the min is the device's actual sustained rate.
    reps_t = int(os.environ.get("BENCH_TRAIN_REPS", 10))
    train_step_ms = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps_t):
            tstate, tmet = tstep(tstate, xt)
        _sync(tstate.params)
        train_step_ms = min(train_step_ms,
                            (time.perf_counter() - t0) / reps_t * 1000.0)
    # NB: cost_analysis counts lax.scan bodies once, so the LSTM
    # recurrence's flops enter for 1 of T-1 steps — a ≤2% undercount here
    # (the conv sweeps, which dominate, are vmapped and counted fully)
    train_mfu = train_tflops = None
    try:
        tcost = tstep.lower(tstate, xt).compile().cost_analysis()
        if isinstance(tcost, (list, tuple)):
            tcost = tcost[0]
        tflops = float(tcost.get("flops", 0.0))
        peak = _peak_flops_per_sec(jax.devices()[0], dtype)
        if tflops > 0 and peak:
            train_mfu = tflops / (train_step_ms / 1000.0) / peak
            # NB: the grouped decoder cut the step's FLOPs ~32% (PERF.md),
            # so train_mfu dropped across r2→r3 while the step got FASTER —
            # judge the step by train_step_ms; train_tflops shows the work
            train_tflops = tflops / 1e12
    except Exception:
        pass
    return {"train_step_ms": train_step_ms, "train_mfu": train_mfu,
            "train_tflops": train_tflops}


def _arm_watchdog():
    """Emit a diagnostic JSON line and exit instead of hanging forever.

    The tunneled TPU's dial can wedge across sessions (every backend call
    blocks with no timeout of its own — observed repeatedly on this box);
    without a watchdog a wedged bench produces NO output for the driver to
    record. 50 min is ~3x the longest observed cold-cache full run;
    override with BENCH_WATCHDOG_MIN (0 disables)."""
    import threading

    mins = float(os.environ.get("BENCH_WATCHDOG_MIN", "50"))
    if mins <= 0:
        return
    def fire():
        print(json.dumps({
            "metric": "frames_per_sec_per_chip", "value": None,
            "unit": "frames/sec", "vs_baseline": None,
            "error": (f"bench watchdog fired after {mins:g} min — the TPU "
                      "dial/compile never returned (tunnel likely wedged); "
                      "no measurement was possible")}), flush=True)
        os._exit(3)
    t = threading.Timer(mins * 60.0, fire)
    t.daemon = True
    t.start()


def main() -> int:
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    model_name = os.environ.get("BENCH_MODEL", "dcgan")   # dcgan | vgg
    width = int(os.environ.get("BENCH_WIDTH", 64))        # 64 | 128
    _arm_watchdog()

    if os.environ.get("BENCH_PHASE") == "train":
        # child mode: measure ONLY the train step and print one JSON line
        import dvg_tpu
        dvg_tpu.enable_compilation_cache()
        print(json.dumps(_measure_train(width, model_name, dtype)))
        return 0

    # ---- train step (lean subprocess) ---------------------------------------
    # the SAME train-step executable reproducibly measures ~66 ms in a lean
    # process but 69-72 ms inside this full bench process (enqueue cost and
    # HBM-pressure ordering both ruled out — PERF.md). Measure it in a child
    # process spawned BEFORE this process dials the (single-tenant) TPU, so
    # BENCH_r*.json carries the honest device number; fall back to an
    # in-process measurement if the child fails for any reason.
    train_res = None
    if os.environ.get("BENCH_TRAIN_SUBPROCESS", "1") == "1":
        import subprocess
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=dict(os.environ, BENCH_PHASE="train"),
                capture_output=True, text=True, timeout=1200)
            train_res = json.loads(p.stdout.strip().splitlines()[-1])
            if "train_step_ms" not in train_res:   # child watchdog/error line
                train_res = None
        except Exception:
            train_res = None

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

    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
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

    if train_res is None:
        train_res = _measure_train(width, model_name, dtype)
        train_res["train_note_process"] = "in-process fallback (child failed)"
    train_step_ms = float(train_res["train_step_ms"])
    train_mfu = train_res.get("train_mfu")
    train_tflops = train_res.get("train_tflops")

    # the full eval protocol: all futures + in-scan SSIM/PSNR on device
    metrics_fn = jax.jit(fns.diverse_metrics)
    out = metrics_fn(params, stats, cache, x, jax.random.PRNGKey(2))
    _sync(out)

    # best of 3 single-rollout timings: each rollout is seconds of device
    # work, but the tunnel's enqueue/RTT noise still wanders a few percent
    # between reps — the min is the chip's sustained rate
    dt = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        out = metrics_fn(params, stats, cache, x, jax.random.PRNGKey(3 + r))
        _sync(out)
        dt = min(dt, time.perf_counter() - t0)
    frames = nsample * (n_eval - n_past) * batch
    fps = frames / dt

    # ---- the other two serving paths ---------------------------------------
    # posterior rollout (generate_frames.py:111-134) and the GP-trigger
    # adaptive path (GPtrigger_gen, 249-300) — a regression in either (e.g.
    # the Python-unrolled trigger warmup) must be visible in BENCH_r*.json
    def _timed(fn, *a, reps=5, windows=3):
        # enqueue a window, settle once: per-rep host syncs bill the
        # tunnel's ~40-60 ms dispatch round-trip to every rep (a 66 ms
        # program "measures" ~128 ms). Best of `windows`: the tunnel's
        # enqueue latency wanders by several ms between runs.
        out = fn(*a)
        _sync(out)
        best = float("inf")
        for _ in range(windows):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(*a)
            _sync(out)
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    post_fn = jax.jit(fns.posterior)
    dt_post = _timed(post_fn, params, stats, cache, x)
    posterior_fps = (n_eval - n_past) * batch / dt_post

    trig_fn = jax.jit(fns.gp_trigger)
    dt_trig = _timed(lambda *a: trig_fn(*a)[0], params, stats, cache, x,
                     jax.random.PRNGKey(6))
    trigger_fps = n_eval * batch / dt_trig     # free-runs all n_eval frames

    # ---- MFU estimate -------------------------------------------------------
    # XLA's cost analysis does not multiply loop trip counts, so analyze ONE
    # rollout step (encode + LSTM + GP sample + decode at the merged S·B
    # batch) and scale by the free-run length. Peak FLOP/s comes from the
    # DETECTED device kind (_peak_flops_per_sec) — MFU is omitted, not
    # guessed, on unknown accelerators. Falls back silently if the backend
    # doesn't expose cost analysis.
    mfu = flops_total = None
    try:
        from dvg_tpu.models import gp as gp_mod

        sb = nsample * batch
        cdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        fold = model.fold_inference_params(params, stats)
        fparams = jax.tree.map(
            lambda a: a.astype(cdtype) if (hasattr(a, "dtype")
                                           and a.dtype == jnp.float32) else a,
            fold)

        def one_step(xin, hidden, k):
            # mirrors the scan body of diverse_metrics' hot path: the skip
            # half of every decoder conv is hoisted OUT of the scan
            # (decode_hoisted consumes precomputed, tiled skip-pre tensors)
            # so the per-step decode FLOPs here are the hoisted ones
            (h, _), _ = model.encode(fparams, stats, xin, train=False)
            h_pred, hidden = model.predict_latent(fparams, hidden, h)
            samp = model.from_gp_layout(gp_mod.cached_rsample(
                jax.tree.map(lambda a: a.astype(cdtype), cache),
                model.to_gp_layout(h), k))
            y = model.decode_hoisted(fparams,
                                     jnp.where(True, samp, h_pred),
                                     [jnp.zeros(s, cdtype)
                                      for s in pre_shapes])
            return y, hidden

        (_, sk0), _ = model.encode(fparams, stats,
                                   jnp.zeros((sb, width, width, 3), cdtype),
                                   train=False)
        pre_shapes = [p.shape for p in model.decode_skip_pre(fparams, sk0)]
        xin0 = jnp.zeros((sb, width, width, 3), cdtype)
        hid0 = model.lstm_hidden_init(sb, dtype=cdtype)
        cost = (jax.jit(one_step)
                .lower(xin0, hid0, jax.random.PRNGKey(0))
                .compile().cost_analysis())
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        step_flops = float(cost.get("flops", 0.0))
        peak = _peak_flops_per_sec(jax.devices()[0], dtype)
        if step_flops > 0 and peak:
            flops_total = step_flops * (n_eval - n_past)
            mfu = flops_total / dt / peak
    except Exception:
        pass

    # ---- reference-execution-model emulation -------------------------------
    # the PyTorch loop (generate_frames.py:143-178) runs ONE sample at a
    # time, ONE frame at a time, copying every frame to host
    # (.cpu().numpy(), lines 175-176). Emulate exactly that: per-frame
    # jitted module calls from Python with a host fetch per frame.
    serial_frames = int(os.environ.get("BENCH_SERIAL_FRAMES", 200))

    from dvg_tpu.models import gp as gp_mod

    @jax.jit
    def one_frame(params, stats, cache, hidden, x_in, key):
        # the reference's COMMON frame (14 of every 15): encoder →
        # frame_predictor → decoder(h_pred); no GP work
        (h, _), _ = model.encode(params, stats, x_in, train=False)
        h_pred, hidden = model.predict_latent(params, hidden, h)
        x_out, _ = model.decode(params, stats, h_pred, skip_holder, train=False)
        return hidden, x_out

    @jax.jit
    def one_frame_fork(params, stats, cache, hidden, x_in, key):
        # the reference's FORK frame (i % 15 == 0): the GP rsample is
        # decoded instead of h_pred (generate_frames.py:168-171) — the
        # sample must stay live or XLA DCEs the whole GP chain
        (h, _), _ = model.encode(params, stats, x_in, train=False)
        h_pred, hidden = model.predict_latent(params, hidden, h)
        samp = model.from_gp_layout(gp_mod.cached_rsample(
            cache, model.to_gp_layout(h), key))
        x_out, _ = model.decode(params, stats, samp, skip_holder, train=False)
        return hidden, x_out

    # fixed skip from the context frame, like the reference's stale skip
    (hh, skip_holder), _ = model.encode(params, stats, x[0], train=False)
    hidden = model.lstm_hidden_init(batch)
    x_in = x[0]
    hidden, x_in = one_frame(params, stats, cache, hidden, x_in,
                             jax.random.PRNGKey(0))
    np.asarray(x_in)                       # warm + sync
    # conservative variant: frames chained by data dependence (x_in feeds
    # the next dispatch), ONE settle at the end — per-frame host syncs are
    # unmeasurable through the tunnel (its block_until_ready acks early)
    # and a real per-frame sync would bill the tunnel's RTT, which the
    # reference's local .cuda() loop never pays. This measures the pure
    # device cost of one-frame-at-a-time dispatch, the most favorable
    # reading of the reference's execution model.
    def _frame_fn(t):
        # reference fork schedule: GP-sampled decode on i % 15 == 0
        return one_frame_fork if t % 15 == 0 else one_frame

    hidden, x_in = one_frame_fork(params, stats, cache, hidden, x_in,
                                  jax.random.PRNGKey(0))
    np.asarray(x_in)                       # warm the fork variant too
    t0 = time.perf_counter()
    for t in range(serial_frames):
        hidden, x_in = _frame_fn(t)(params, stats, cache, hidden, x_in,
                                    jax.random.PRNGKey(t))
    _sync(x_in)
    dt_serial = time.perf_counter() - t0
    serial_total_fps = serial_frames * batch / dt_serial
    # faithful variant incl. the reference's per-frame .cpu().numpy()
    t0 = time.perf_counter()
    for t in range(serial_frames):
        hidden, x_in = _frame_fn(t)(params, stats, cache, hidden, x_in,
                                    jax.random.PRNGKey(t))
        np.asarray(x_in)
    serial_fetch_fps = serial_frames * batch / (time.perf_counter() - t0)

    # dispatch-insensitive variant: the SAME unbatched (one-sample-at-a-
    # time, frame-serial, fork every 15th frame) execution order, chained
    # inside ONE lax.scan — zero per-frame dispatch, pure device time.
    # This denominator is stable across tunnel environments (the dispatch-
    # bound ones above swung 7x between rounds with relay latency alone,
    # BENCH_r03 vs r04), so the HEADLINE vs_baseline uses it; the
    # dispatch-bound variants stay in `detail` as the amortization demo.
    @jax.jit
    def serial_scan(params, stats, cache, hidden, x0, key):
        def common(args):
            h_pred, h, k = args
            return h_pred

        def fork(args):
            h_pred, h, k = args
            return model.from_gp_layout(gp_mod.cached_rsample(
                cache, model.to_gp_layout(h), k))

        def body(carry, t):
            hidden, x_in = carry
            (h, _), _ = model.encode(params, stats, x_in, train=False)
            h_pred, hidden = model.predict_latent(params, hidden, h)
            latent = jax.lax.cond(t % 15 == 0, fork, common,
                                  (h_pred, h, jax.random.fold_in(key, t)))
            x_out, _ = model.decode(params, stats, latent, skip_holder,
                                    train=False)
            return (hidden, x_out), ()

        (hidden, x_out), _ = jax.lax.scan(
            body, (hidden, x0), jnp.arange(serial_frames))
        return x_out

    hid0 = model.lstm_hidden_init(batch)
    out_s = serial_scan(params, stats, cache, hid0, x[0],
                        jax.random.PRNGKey(0))
    _sync(out_s)
    dt_dev = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        out_s = serial_scan(params, stats, cache, hid0, x[0],
                            jax.random.PRNGKey(1 + r))
        _sync(out_s)
        dt_dev = min(dt_dev, time.perf_counter() - t0)
    serial_device_fps = serial_frames * batch / dt_dev

    # ---- variant matrix ----------------------------------------------------
    # every supported serving/training configuration in ONE run, so a
    # regression in any variant shows up in BENCH_r*.json without manual
    # env-knob reruns. Variant geometries are smaller than the headline
    # (fixed per variant, stable round-to-round — deltas are what matter).
    variants = {}
    if os.environ.get("BENCH_VARIANTS", "1") == "1":
        def _variant_rollout(vmodel, vwidth, vdtype, vpallas, vfullcov,
                             vsample=20, vbatch=None, vneval=35):
            vbatch = vbatch if vbatch is not None else (50 if vwidth == 64
                                                        else 8)
            vcfg = DVGConfig(dataset="bair", channels=3, image_width=vwidth,
                             batch_size=vbatch, n_past=n_past,
                             n_future=vneval - n_past, n_eval=vneval,
                             model=vmodel, nsample=vsample, dtype=vdtype,
                             use_pallas=vpallas, full_cov_sampling=vfullcov)
            vm = DVGModel(vcfg)
            vp, vs = vm.init(jax.random.PRNGKey(0))
            vc = vm.gp_cache(vp)
            vfns = make_rollout_fns(vm, vcfg, nsample=vsample)
            vx = jax.device_put(jax.random.uniform(
                jax.random.PRNGKey(1),
                (vneval, vbatch, vwidth, vwidth, 3), jnp.float32))
            vfn = jax.jit(vfns.diverse_metrics)
            o = vfn(vp, vs, vc, vx, jax.random.PRNGKey(2))
            _sync(o)
            t0 = time.perf_counter()
            for r in range(2):
                o = vfn(vp, vs, vc, vx, jax.random.PRNGKey(3 + r))
            _sync(o)
            vdt = (time.perf_counter() - t0) / 2
            return round(vsample * (vneval - n_past) * vbatch / vdt, 1)

        def _variant_train(vmodel, vwidth, vdtype):
            # same recipe as the headline train_step_ms (_measure_train:
            # best of 3 pipelined windows of BENCH_TRAIN_REPS) so variant
            # deltas are methodology-comparable; runs in-process (the
            # fault-isolated cell), which the tunnel biases a few ms high
            # uniformly across variants (PERF.md)
            return round(_measure_train(vwidth, vmodel,
                                        vdtype)["train_step_ms"], 2)

        cells = [
            ("vgg128_bf16_fps",
             lambda: _variant_rollout("vgg", 128, "bfloat16",
                                      use_pallas, False)),
            ("vgg128_bf16_train_ms",
             lambda: _variant_train("vgg", 128, "bfloat16")),
            ("dcgan64_f32_fps",
             lambda: _variant_rollout("dcgan", 64, "float32",
                                      use_pallas, False)),
            ("dcgan64_fullcov_fps",
             lambda: _variant_rollout("dcgan", 64, dtype, use_pallas, True)),
            ("dcgan64_nopallas_fps",
             lambda: _variant_rollout("dcgan", 64, dtype, False, False)),
        ]
        for vname, cell in cells:
            try:                        # a broken variant must not kill the
                variants[vname] = cell()    # headline bench line or its peers
            except Exception as e:
                variants[vname] = "error: " + repr(e)
        variants["geometry"] = ("rollout: S=20 B=50(64px)/8(128px) T=35; "
                                "train: B=50(64px)/8(128px) T=15")
        variants["geometry_why"] = (
            "variants are regression tripwires, not headlines: each cell "
            "at the full S=100/T=105 protocol costs a ~3-5 min cold "
            "compile through the remote-compile relay (5 cells would eat "
            "the 50-min watchdog budget on a cache miss) for no extra "
            "signal — the cells are compared round-to-round at a FIXED "
            "geometry, so deltas, not absolute values, are the contract. "
            "Caveat (VERDICT r4): per-step effects weigh differently at "
            "T=35 than T=105 — a regression isolated to long-scan "
            "behavior would need a headline-geometry rerun to quantify")

    # ---- serving artifact: parity + overhead vs live jit -------------------
    # the exported StableHLO (serve/export.py) must produce the SAME numbers
    # as the live-jitted rollout and run within a few % of it — a slow
    # re-compile or layout cliff through jax.export would be invisible to
    # the pytest roundtrip (which runs on CPU).
    serve = {}
    if os.environ.get("BENCH_SERVE", "1") == "1":
        try:
            import tempfile

            from dvg_tpu.serve import export_serving, load_serving
            from dvg_tpu.train.checkpoint import save_checkpoint

            # cap at the clip length actually benched so BENCH_NEVAL < 35
            # quick runs still exercise the serve block instead of erroring
            sv_sample, sv_batch, sv_neval = 20, batch, min(35, n_eval)
            scfg = cfg.replace(nsample=sv_sample, n_eval=sv_neval,
                               n_future=sv_neval - n_past)
            with tempfile.TemporaryDirectory() as td:
                ckdir = os.path.join(td, "model")
                # persist the BENCH model's weights (not the train state's)
                from dvg_tpu.train.step import TrainState
                from dvg_tpu.train.optim import (make_optimizers,
                                                 split_params)
                opts = make_optimizers(scfg)
                groups = split_params(params)
                st = TrainState(params, stats,
                                {n: getattr(opts, n).init(groups[n])
                                 for n in groups}, jnp.zeros((), jnp.int32))
                save_checkpoint(ckdir, scfg, st)
                art = os.path.join(td, "diverse.stablehlo")
                export_serving(ckdir, art, entry="diverse_metrics",
                               nsample=sv_sample, batch_size=sv_batch,
                               n_eval=sv_neval)
                served = load_serving(art)

                sfns = make_rollout_fns(model, scfg, nsample=sv_sample)
                live = jax.jit(sfns.diverse_metrics)
                xs = x[:sv_neval]
                k = jax.random.PRNGKey(11)
                o_live = live(params, stats, cache, xs, k)
                o_art = served(xs, k)      # PRNGKey is a raw (2,) u32 here
                _sync((o_live, o_art))
                eq = all(bool(np.allclose(np.asarray(a), np.asarray(b),
                                          rtol=1e-5, atol=1e-5))
                         for a, b in zip(jax.tree.leaves(o_live),
                                         jax.tree.leaves(o_art)))

                def _t(fn, *a):
                    # per-call fetch on BOTH sides: the tunnel RTT biases
                    # live and artifact equally, so the ratio is clean
                    # (pipelined enqueue treats the two call paths
                    # differently and fabricated a 3x artifact "overhead")
                    best = float("inf")
                    for _ in range(3):
                        t0 = time.perf_counter()
                        _sync(fn(*a))
                        best = min(best, time.perf_counter() - t0)
                    return best

                live_s = _t(live, params, stats, cache, xs, k)
                art_s = _t(served, xs, k)
                serve = {"entry": "diverse_metrics",
                         "outputs_equal_live_jit": eq,
                         "live_ms": round(live_s * 1000.0, 2),
                         "artifact_ms": round(art_s * 1000.0, 2),
                         "overhead_pct": round((art_s / live_s - 1) * 100, 2)}
        except Exception as e:
            serve = {"error": repr(e)}

    rec = {
        "metric": (f"generated frames/sec/chip ({width}x{width} RGB {model_name}, "
                   f"{n_eval - n_past}-future, {nsample}-sample diverse rollout, "
                   f"batch {batch})"),
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        # device-time denominator: environment-stable (see serial_note)
        "vs_baseline": round(fps / serial_device_fps, 2),
        "detail": {
            "batched_s_per_rollout": round(dt, 4),
            "serial_device_scan_fps": round(serial_device_fps, 1),
            "vs_baseline_dispatch_bound": round(fps / serial_total_fps, 2),
            "posterior_ms": round(dt_post * 1000.0, 2),
            "posterior_fps": round(posterior_fps, 1),
            "gp_trigger_ms": round(dt_trig * 1000.0, 2),
            "gp_trigger_fps": round(trigger_fps, 1),
            "serial_emulation_fps": round(serial_total_fps, 1),
            "serial_with_per_frame_host_copies_fps": round(serial_fetch_fps, 1),
            "serial_note": ("headline vs_baseline divides by "
                            "serial_device_scan_fps: the reference's "
                            "execution order (one sample at a time, one "
                            "frame at a time, fork every 15th) chained in "
                            "ONE lax.scan — pure device time, stable "
                            "across tunnel environments. The two "
                            "dispatch-bound denominators "
                            "(serial_emulation_fps, per-frame jitted "
                            "dispatches; serial_with_per_frame_host_copies_"
                            "fps, + a host fetch each frame) are kept for "
                            "the amortization story but are per-program "
                            "DISPATCH-bound on this tunneled chip (~5-9 ms "
                            "per one-frame program vs ~0.3 ms of device "
                            "work) — vs_baseline_dispatch_bound swung 7x "
                            "between r3 and r4 with relay latency alone, "
                            "which is why it was demoted from the "
                            "headline. All emulations remain generous to "
                            "the reference (jitted XLA one-frame programs "
                            "stand in for eager torch + gpytorch CG)"),
            "train_step_ms": round(train_step_ms, 2),
            "train_mfu": (round(train_mfu, 4)
                          if train_mfu is not None else None),
            "train_tflops": (round(train_tflops, 3)
                             if train_tflops is not None else None),
            "train_note": ("train_mfu divides by CURRENT step FLOPs; the "
                           "grouped decoder cut FLOPs ~32% in r3 so the "
                           "ratio fell while the step got FASTER — "
                           "train_step_ms is the honest metric (PERF.md); "
                           "measured in a lean child process"
                           + (" [" + train_res["train_note_process"] + "]"
                              if "train_note_process" in train_res else "")),
            "variants": variants or None,
            "serve": serve or None,
            "mfu": round(mfu, 4) if mfu is not None else None,
            "rollout_tflops": (round(flops_total / 1e12, 2)
                               if flops_total else None),
            "device": str(jax.devices()[0]),
            "dtype": dtype,
        },
    }
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
