"""Generation/eval driver. Mirrors `python generate_frames.py ...`
(/root/reference/generate_frames.py:17-41 flags, 324-329 main loop):

  * loads the checkpoint, REPLACES the live config with the saved one, then
    overrides n_eval=105 / n_future=100 / batch_size=50 (the restore-then-
    override contract, generate_frames.py:43-49);
  * default path: for 5 test batches → posterior rollout + 100-sample
    diverse rollout (GP fork every 15th frame), per-sample SSIM/PSNR,
    best-of-N-by-mean-SSIM GIF with green-context/red-prediction borders
    (make_gifs, generate_frames.py:107-217);
  * --gp_trigger_flag: the adaptive variance-trigger path (GPtrigger_gen,
    generate_frames.py:249-300) writing every-3rd-frame strips under
    recursive_generation/<idx>/.

TPU-native: the 100 futures are ONE vmapped scan (optionally sharded over a
('sample','data') mesh), SSIM/PSNR run on device, and the eval arrays the
reference discards (generate_frames.py:329) are persisted as .npz.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="DVG-TPU generation/eval")
    # reference flags (generate_frames.py:17-41)
    p.add_argument("--batch_size", default=50, type=int)
    p.add_argument("--log_dir", default="logs_gp")
    p.add_argument("--model_dir", default="")
    p.add_argument("--name", default="")
    p.add_argument("--data_root", default="./data/kth")
    p.add_argument("--seed", default=1, type=int)
    p.add_argument("--image_width", type=int, default=64)
    p.add_argument("--channels", default=1, type=int)
    p.add_argument("--gp_trigger_flag", action="store_true", default=False)
    # the reference restores `dataset` from the checkpoint (its --dataset
    # flag is dead: generate_frames.py:44 replaces opt wholesale); honor an
    # EXPLICIT --dataset as an override, else keep the saved one
    p.add_argument("--dataset", default=None)
    p.add_argument("--n_past", type=int, default=5)
    p.add_argument("--n_future", type=int, default=10)
    p.add_argument("--n_eval", type=int, default=60)
    p.add_argument("--rnn_size", type=int, default=256)
    p.add_argument("--predictor_rnn_layers", type=int, default=2)
    p.add_argument("--z_dim", type=int, default=10)
    p.add_argument("--g_dim", type=int, default=90)
    p.add_argument("--model", default="dcgan")
    p.add_argument("--data_threads", type=int, default=5)
    p.add_argument("--last_frame_skip", action="store_true")
    # TPU-native extras
    p.add_argument("--nsample", type=int, default=100)
    p.add_argument("--num_batches", type=int, default=5)
    p.add_argument("--mesh_samples", type=int, default=0,
                   help="shard the sample axis over N devices (0 = off)")
    p.add_argument("--mesh_data", type=int, default=1,
                   help="with --mesh_samples: also shard the eval batch "
                        "rows over N devices (2-D ('sample','data') mesh)")
    # debugging escapes from the restore-then-override contract
    # (generate_frames.py:47-49 hardcodes n_eval=105/n_future=100/batch=50)
    p.add_argument("--override_n_eval", type=int, default=0)
    p.add_argument("--override_batch_size", type=int, default=0)
    p.add_argument("--gif_rows", type=int, default=10,
                   help="batch rows to render GIFs for (the reference's "
                        "early-return quirk yields 1/call; we default 10)")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--use_pallas", action="store_true", default=None,
                   help="fused Pallas SSIM kernel for the in-scan metrics "
                        "(default: auto — ON on TPU, OFF elsewhere)")
    p.add_argument("--no_pallas", dest="use_pallas", action="store_false",
                   help="force the XLA metrics path")
    p.add_argument("--trace_dir", default="",
                   help="dump a jax.profiler trace of the first eval batch")
    p.add_argument("--finn", action="store_true",
                   help="Finn-variant SSIM/PSNR (utils.py:237-301)")
    p.add_argument("--trigger_sigma", type=float, default=2.01,
                   help="σ multiple in the GP-trigger threshold "
                        "(reference: frozen 2.01, generate_frames.py:230)")
    p.add_argument("--trigger_margin", type=float, default=0.0,
                   help="absolute margin subtracted from the trigger "
                        "threshold (0 = reference-exact; >0 forks more "
                        "eagerly — the only knob that can fire on a "
                        "near-constant variance signal)")
    p.add_argument("--full_cov", action="store_true",
                   help="reference-exact batch-correlated GP sampling at "
                        "fork steps (generate_frames.py:170 .rsample()) "
                        "instead of the default per-row marginal draw")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from dvg_tpu.data import Loader, load_dataset
    from dvg_tpu.generate.rollout import best_of_n, make_rollout_fns
    from dvg_tpu.models.dvg import DVGModel
    from dvg_tpu.parallel import distributed_init, is_coordinator, make_mesh
    from dvg_tpu.train import (init_train_state, load_checkpoint_blob,
                               read_checkpoint_bytes_synced, restore_state)
    from dvg_tpu.utils import (MetricLogger, add_border, save_gif_with_text,
                               save_image)

    # ---- restore-then-override (generate_frames.py:43-49) -------------------
    import dvg_tpu
    distributed_init()           # multi-host no-op unless configured
    dvg_tpu.enable_compilation_cache()

    ckpt = os.path.join(args.model_dir, "model.ckpt")
    saved_cfg, payload = load_checkpoint_blob(
        read_checkpoint_bytes_synced(ckpt))
    cfg = saved_cfg.generation_override()
    use_pallas = (jax.default_backend() == "tpu"
                  if args.use_pallas is None else args.use_pallas)
    cfg = cfg.replace(log_dir=args.log_dir,
                      dataset=args.dataset or cfg.dataset,
                      data_root=args.data_root,
                      gp_trigger_flag=args.gp_trigger_flag,
                      trigger_sigma=args.trigger_sigma,
                      trigger_margin=args.trigger_margin,
                      nsample=args.nsample, dtype=args.dtype,
                      use_pallas=use_pallas,
                      full_cov_sampling=args.full_cov,
                      eval_metric="finn" if args.finn else "skimage")
    # NB --full_cov with --mesh_data>1 is rejected by
    # parallel/mesh.py::shard_diverse_rollout (the guard lives at the
    # mechanism so library callers are covered too, not just the CLI)
    if args.override_n_eval:
        cfg = cfg.replace(n_eval=args.override_n_eval,
                          n_future=args.override_n_eval - cfg.n_past)
    if args.override_batch_size:
        cfg = cfg.replace(batch_size=args.override_batch_size)
    if is_coordinator():
        os.makedirs(cfg.log_dir, exist_ok=True)
    logger = MetricLogger(cfg.log_dir)

    model = DVGModel(cfg)
    # rebuild a state skeleton from the SAVED config geometry, then restore
    # from the already-decoded (and, multi-host, broadcast) payload
    _, skeleton, _ = init_train_state(cfg, jax.random.PRNGKey(0))
    state = restore_state(skeleton, payload)
    params, stats = state.params, state.stats
    cache = model.gp_cache(params)

    test_ds = load_dataset(cfg, seq_len=cfg.n_eval, split="test")
    test_loader = Loader(test_ds, cfg.batch_size, shuffle=False,
                         seed=cfg.seed, num_threads=args.data_threads)

    fns = make_rollout_fns(model, cfg, nsample=cfg.nsample)
    posterior = jax.jit(fns.posterior)
    select_pairs = jax.jit(fns.diverse_select_pairs)
    select_fullbatch = jax.jit(fns.diverse_rollout_with_keys)
    trigger = jax.jit(fns.gp_trigger)
    s_local_for_keys = None     # sample-parallel key translation (below)
    if args.mesh_data > 1 and args.mesh_samples <= 1:
        raise SystemExit(
            "--mesh_data > 1 extends the sample-parallel mesh to 2-D and "
            "requires --mesh_samples > 1; it would otherwise be silently "
            "ignored")
    if args.mesh_samples > 1:
        # sample-parallel eval: each device rolls out nsample/N futures;
        # with --mesh_data the eval batch rows shard too (2-D mesh — the
        # layout for a pod slice: 'sample' over one ICI axis, 'data' over
        # the other)
        from dvg_tpu.parallel import shard_diverse_rollout
        assert cfg.nsample % args.mesh_samples == 0
        s_local = cfg.nsample // args.mesh_samples
        mesh_data = max(1, args.mesh_data)
        if mesh_data > 1:
            assert cfg.batch_size % mesh_data == 0
            mesh = make_mesh([("sample", args.mesh_samples),
                              ("data", mesh_data)])
            data_axis = "data"
        else:
            mesh = make_mesh([("sample", args.mesh_samples)])
            data_axis = None
        local_fns = make_rollout_fns(model, cfg, nsample=s_local)
        metrics_fn = shard_diverse_rollout(local_fns.diverse_metrics, mesh,
                                           data_axis=data_axis,
                                           full_cov=cfg.full_cov_sampling)
        s_local_for_keys = s_local
        if jax.process_count() > 1:
            # multi-process eval: the mesh spans every process's devices
            # (make_mesh uses jax.devices()). Lift the model onto the
            # global mesh once, lift each batch on arrival, and gather the
            # sample-sharded metrics back to every host. The posterior/
            # GIF-re-roll paths keep the HOST-LOCAL params (no collectives,
            # coordinator-only). AOT-compile + barrier first: the gather is
            # the run's first cross-process collective and its context
            # init must not race a still-compiling peer.
            from jax.experimental import multihost_utils

            from dvg_tpu.parallel import replicate_to_mesh
            g_model = replicate_to_mesh((params, stats, cache), mesh)
            base_metrics = metrics_fn
            x_spec = jax.ShapeDtypeStruct(
                (cfg.n_eval, cfg.batch_size, cfg.image_width,
                 cfg.image_width, cfg.channels), jnp.float32)
            k_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)
            xg_spec, kg_spec = jax.tree.map(
                lambda s: jax.ShapeDtypeStruct(
                    s.shape, s.dtype,
                    sharding=jax.sharding.NamedSharding(
                        mesh, jax.sharding.PartitionSpec())),
                (x_spec, k_spec))
            base_metrics.lower(*g_model, xg_spec, kg_spec).compile()
            from jax._src import distributed as _dist
            _dist.global_state.client.wait_at_barrier(
                "dvg_eval_precompile", timeout_in_ms=1_200_000)

            def metrics_fn(_p, _s, _c, x, key):
                xg, kg = replicate_to_mesh(
                    (np.asarray(x), np.asarray(key)), mesh)
                out = base_metrics(*g_model, xg, kg)
                return multihost_utils.process_allgather(out, tiled=True)
    else:
        metrics_fn = jax.jit(fns.diverse_metrics)

    def pair_base_keys(key, sample_ids):
        """Per-sample base keys for global sample ids. Unsharded eval drew
        sample g's step keys from split(key, nsample)[g]; the
        sample-parallel mesh drew them from
        split(fold_in(key, device), s_local)[local] with
        (device, local) = divmod(g, s_local) — reproduce whichever keyed
        the scored futures so re-rolls are exact."""
        if s_local_for_keys is None:
            all_keys = jax.random.split(key, cfg.nsample)
            return jnp.take(all_keys, jnp.asarray(sample_ids), axis=0)
        ks = []
        for g in sample_ids:
            dev, loc = divmod(int(g), s_local_for_keys)
            ks.append(jax.random.split(jax.random.fold_in(key, dev),
                                       s_local_for_keys)[loc])
        return jnp.stack(ks)

    import contextlib

    for bi in range(args.num_batches):
        print(f"batch {bi}: loading...", flush=True)
        x = jnp.asarray(test_loader.next_batch(bi))
        key = jax.random.PRNGKey(cfg.seed * 1000 + bi)
        # one trace context for whichever path runs — --trace_dir applies to
        # the gp-trigger rollout too, not just the diverse eval
        trace_ctx = (jax.profiler.trace(args.trace_dir)
                     if args.trace_dir and bi == 0
                     else contextlib.nullcontext())
        if cfg.gp_trigger_flag:
            print(f"batch {bi}: gp-trigger rollout...", flush=True)
            with trace_ctx:
                frames, diag = trigger(params, stats, cache, x, key)
                jax.block_until_ready(frames)
            if is_coordinator():       # multi-host: one writer
                _save_trigger_strips(np.asarray(frames), np.asarray(x), bi,
                                     cfg, save_image)
            logger.log(bi, {"triggers": float(np.asarray(
                diag["triggers"]).sum())}, kind="trigger")
            continue

        with trace_ctx:
            post = None
            if is_coordinator():   # only the GIF writer consumes it
                print(f"batch {bi}: posterior rollout...", flush=True)
                post = posterior(params, stats, cache, x)  # (T, B, ...)
            print(f"batch {bi}: {cfg.nsample}-sample diverse rollout + "
                  "in-scan SSIM/PSNR...", flush=True)
            met = metrics_fn(params, stats, cache, x, key)  # (S, T', B) each
            jax.block_until_ready(met["ssim"])
        ssim = np.asarray(jnp.transpose(met["ssim"], (2, 0, 1)))  # (B, S, T')
        psnr = np.asarray(jnp.transpose(met["psnr"], (2, 0, 1)))
        best_idx, best_ssim = best_of_n(jnp.asarray(ssim))
        logger.save_arrays(f"eval_batch{bi}", ssim=ssim, psnr=psnr)
        logger.log(bi, {"ssim_best_mean": float(jnp.mean(best_ssim)),
                        "psnr_mean": float(psnr.mean())}, kind="eval")
        print(f"batch {bi}: re-rolling selected samples for GIFs...",
              flush=True)
        if not is_coordinator():       # multi-host: one writer renders GIFs
            continue
        # pair list: per GIF row, [best-by-SSIM, 3 random] samples
        # (generate_frames.py:185-216 selection). The reference re-reads
        # its 100x104 host-resident futures; here the chosen futures are
        # re-rolled exactly in ONE dispatch.
        rows_n = min(x.shape[1], args.gif_rows)
        rng = np.random.RandomState(bi)
        pair_sids, pair_rows = [], []
        for i in range(rows_n):
            ids = [int(best_idx[i])] + list(rng.randint(0, ssim.shape[1], 3))
            pair_sids += ids
            pair_rows += [i] * 4
        if cfg.full_cov_sampling:
            # correlated draws span the whole batch: re-roll each UNIQUE
            # sample on the full batch once, slice (sample, row) after
            uniq = sorted(set(pair_sids))
            out = np.asarray(select_fullbatch(
                params, stats, cache, x, pair_base_keys(key, uniq),
                jnp.arange(x.shape[1])))        # (U, n_eval, B, ...)
            pos = {g: j for j, g in enumerate(uniq)}
            frames_of = lambda k: out[pos[pair_sids[k]], :, pair_rows[k]]
        else:
            outp = np.asarray(select_pairs(
                params, stats, cache, jnp.asarray(x)[:, np.asarray(pair_rows)],
                pair_base_keys(key, pair_sids),
                jnp.asarray(pair_rows)))        # (n_eval, K, H, W, C)
            frames_of = lambda k: outp[:, k]
        _save_sample_gifs(np.asarray(x), np.asarray(post), frames_of,
                          rows_n, bi, cfg, add_border, save_gif_with_text)
    return 0


def _save_sample_gifs(x, post, frames_of, rows_n, batch_idx, cfg, add_border,
                      save_gif_with_text):
    """GT + posterior + best-SSIM + 3 random samples, bordered and captioned
    (generate_frames.py:185-216). The reference keeps all 100x104 futures on
    host and `return`s inside its loop so only one GIF per call emerges
    (quirk, SURVEY.md §5.6); here `frames_of(k)` indexes the already
    re-rolled (n_eval, H, W, C) future of pair k = 4·row + column."""
    for i in range(rows_n):
        pair = [frames_of(4 * i + j) for j in range(4)]
        gifs, texts = [], []
        for t in range(cfg.n_eval):
            color = "green" if t < cfg.n_past else "red"
            row = [add_border(x[t, i], "green"),
                   add_border(post[t, i], color),
                   add_border(pair[0][t], color)]
            txt = ["Ground\ntruth", "Approx.\nposterior", "Best SSIM"]
            for k in range(3):
                row.append(add_border(pair[k + 1][t], color))
                txt.append("Random\nsample %d" % (k + 1))
            gifs.append(row)
            texts.append(txt)
        fname = os.path.join(cfg.log_dir,
                             f"sample_lstm_{batch_idx * x.shape[1] + i}.gif")
        save_gif_with_text(fname, gifs, texts)


def _save_trigger_strips(frames, x, batch_idx, cfg, save_image):
    """Every-3rd-frame strip per batch row (plot_rec contract,
    generate_frames.py:235-245) under recursive_generation/<idx>/."""
    for i in range(frames.shape[1]):
        strip = [frames[t, i] for t in range(0, frames.shape[0], 3)]
        save_image(os.path.join(
            "recursive_generation", str(i),
            f"heuristic_gp_trigger_1_0_b{batch_idx}.png"), [strip])


if __name__ == "__main__":
    sys.exit(main())
