"""Training driver. Mirrors `python train.py ...` of the reference
(/root/reference/train.py:17-46 flags, 340-392 epoch loop), with the flags
the reference declares-but-ignores (`--model`, `--image_width`) honored for
real, plus TPU-native extras:

  --mesh N        data-parallel over N devices (default: all available)
  --resume        resume training from the checkpoint in --output_path
                  (the reference cannot resume at all, SURVEY.md §5.3)
  --trace_dir D   dump a jax.profiler trace for the first few steps
  --ckpt_every K  checkpoint cadence in epochs (reference: 4)

Per epoch: `epoch_size` jitted steps (each = the reference's joint +
finetune passes); every `ckpt_every` epochs a 5-sample qualitative plot
(train.py:256-335 contract: GP fork at i==10, best-of-5-by-MSE grid) and a
rotating checkpoint save (train.py:380-388).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="DVG-TPU training")
    # reference flags (train.py:17-46), same names and defaults
    p.add_argument("--lr", default=0.002, type=float)
    p.add_argument("--beta1", default=0.9, type=float)
    p.add_argument("--batch_size", default=50, type=int)
    p.add_argument("--log_dir", default="logs")
    p.add_argument("--model_dir", default="")
    p.add_argument("--name", default="")
    p.add_argument("--output_path", default=".")
    p.add_argument("--data_root", default="path/to/data/")
    p.add_argument("--optimizer", default="adam")
    p.add_argument("--niter", type=int, default=601)
    p.add_argument("--seed", default=1, type=int)
    p.add_argument("--epoch_size", type=int, default=300)
    p.add_argument("--image_width", type=int, default=64)
    p.add_argument("--channels", default=1, type=int)
    p.add_argument("--dataset", default="kth")
    p.add_argument("--n_past", type=int, default=5)
    # the reference's `type=bool` makes any string truthy; use a real flag
    # pair with the same default=True semantics
    p.add_argument("--ft", dest="ft", action="store_true", default=True)
    p.add_argument("--no_ft", dest="ft", action="store_false")
    p.add_argument("--n_future", type=int, default=10)
    p.add_argument("--n_eval", type=int, default=15)
    p.add_argument("--rnn_size", type=int, default=256)
    p.add_argument("--predictor_rnn_layers", type=int, default=2)
    p.add_argument("--z_dim", type=int, default=10)
    p.add_argument("--g_dim", type=int, default=90)
    p.add_argument("--model", default="dcgan", choices=["dcgan", "vgg"])
    p.add_argument("--data_threads", type=int, default=5)
    p.add_argument("--last_frame_skip", action="store_true")
    p.add_argument("--num_digits", type=int, default=2)
    # TPU-native extras
    p.add_argument("--mesh", type=int, default=0,
                   help="data-parallel device count (0 = all)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--ckpt_every", type=int, default=4)
    p.add_argument("--trace_dir", default="")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="conv/LSTM compute dtype (bf16 mixed precision: "
                        "f32 master params, losses, GP, BN statistics)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize conv sweeps (fits VGG-128 in HBM)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from dvg_tpu.config import DVGConfig
    from dvg_tpu.data import Loader, load_dataset
    from dvg_tpu.generate.rollout import make_rollout_fns
    from dvg_tpu.parallel import (distributed_init, is_coordinator,
                                  make_mesh, replicate_to_mesh, shard_batch)
    from dvg_tpu.train import (init_train_state, load_checkpoint,
                               make_train_step, save_checkpoint)
    from dvg_tpu.utils import MetricLogger, StepTimer, save_gif, save_image

    import dvg_tpu
    distributed_init()           # multi-host no-op unless configured
    dvg_tpu.enable_compilation_cache()

    cfg = DVGConfig(**{k: v for k, v in vars(args).items()
                       if k in DVGConfig.__dataclass_fields__})
    if is_coordinator():
        os.makedirs(cfg.log_dir, exist_ok=True)
    logger = MetricLogger(cfg.log_dir)

    # ---- model / state -----------------------------------------------------
    key = jax.random.PRNGKey(cfg.seed)
    model, state, opts = init_train_state(cfg, key)
    start_epoch = 0
    ckpt_path = os.path.join(cfg.output_path, "model.ckpt")
    if args.resume and os.path.exists(ckpt_path):
        saved_cfg, state = load_checkpoint(ckpt_path, target_state=state)
        print(f"resumed from {ckpt_path}")
    if args.resume and jax.process_count() > 1:
        # checkpoints are written coordinator-only, so on per-host local
        # disks the other processes may have no (or a stale) model.ckpt —
        # without this broadcast they would silently keep the seed init and
        # run a different epoch range, corrupting the 'replicated' state
        from jax.experimental import multihost_utils
        state = jax.tree.map(
            np.asarray,
            multihost_utils.broadcast_one_to_all(
                jax.tree.map(np.asarray, state)))
    resume_step = int(state.step)
    start_epoch = resume_step // cfg.epoch_size
    if args.resume and start_epoch:
        print(f"resuming at epoch {start_epoch}")

    # ---- data ---------------------------------------------------------------
    train_ds = load_dataset(cfg, seq_len=cfg.seq_len_train, split="train")
    # the qualitative plot rolls out n_eval frames (train.py:256-335)
    test_ds = load_dataset(cfg, seq_len=max(cfg.n_eval, cfg.seq_len_train),
                           split="test")
    n_dev = args.mesh or len(jax.devices())
    mesh = make_mesh([("data", n_dev)]) if n_dev > 1 else None
    sharding = shard_batch(mesh) if mesh else None
    if mesh is not None and jax.process_count() > 1:
        # multi-host: the same-seed init (or loaded checkpoint) exists on
        # every process; lift it onto the GLOBAL mesh so the jitted step is
        # one SPMD program psumming gradients over ICI/DCN (SURVEY.md §5.8)
        state = replicate_to_mesh(state, mesh)
    train_loader = Loader(train_ds, cfg.batch_size, seed=cfg.seed,
                          num_threads=cfg.data_threads, sharding=sharding)
    test_loader = Loader(test_ds, cfg.batch_size, seed=cfg.seed + 1,
                         shuffle=False, num_threads=cfg.data_threads)

    # ---- step ----------------------------------------------------------------
    step_fn = make_train_step(model, cfg, opts, mesh=mesh)
    plot_fns = make_rollout_fns(model, cfg, nsample=5)
    timer = StepTimer()
    if mesh is not None and jax.process_count() > 1:
        # AOT-compile the step on EVERY process (populating the persistent
        # compile cache), then rendezvous through the coordination service:
        # the first real dispatch initializes the cross-process collective
        # context under a short budget (Gloo: 30 s), which a peer that is
        # still compiling would blow through
        x_spec = jax.ShapeDtypeStruct(
            (cfg.seq_len_train, cfg.batch_size, cfg.image_width,
             cfg.image_width, cfg.channels), jnp.float32, sharding=sharding)
        step_fn.lower(state, x_spec).compile()
        from jax._src import distributed as _dist
        _dist.global_state.client.wait_at_barrier(
            "dvg_train_precompile", timeout_in_ms=1_200_000)

    # ---- epoch loop (reference train.py:340-392) ----------------------------
    # keep the host ahead of the device: batches come from the Loader's
    # prefetch thread, and per-step metrics accumulate ON DEVICE (a float()
    # per step would sync the pipeline ~3x slower)
    # resume continues the (seed, step) data stream at the checkpointed
    # step — iterating from 0 would replay the exact batch sequence the
    # model already trained on
    batches = train_loader.iter_from(resume_step)
    if args.trace_dir:
        # profile a few steady-state steps (compile happens outside the
        # trace); the handful of extra steps slightly advances state.step
        def _step():
            nonlocal state
            x = next(batches)
            if sharding is None:
                x = jnp.asarray(x)
            state, _ = step_fn(state, x)
        _step()
        jax.block_until_ready(state.params)
        with jax.profiler.trace(args.trace_dir):
            for _ in range(3):
                _step()
            jax.block_until_ready(state.params)
        print(f"profiler trace written to {args.trace_dir}")
    # the on-device epoch accumulator must share the metrics' sharding
    # (replicated on the GLOBAL mesh in a multi-host run) for the eager
    # per-step adds to compose
    zero = jnp.zeros((), jnp.float32)
    if mesh is not None and jax.process_count() > 1:
        zero = replicate_to_mesh(zero, mesh)
    for epoch in range(start_epoch, cfg.niter):
        epoch_mse = zero
        timer.start()
        for i in range(cfg.epoch_size):
            x = next(batches)
            if sharding is None:
                x = jnp.asarray(x)
            state, metrics = step_fn(state, x)
            # reference epoch metric (train.py:363): mse_ctrl + temp_loss,
            # where mse_ctrl = Σ mse_latent / T (train.py:248) and
            # temp_loss = Σ ft_mse_latent / T + Σ ft_gp_nll / T
            # (train.py:172, 198, 252-255), T = n_past + n_future.
            # step.py's ft_mse_latent / ft_gp_nll are the frame SUMS.
            epoch_mse = epoch_mse + metrics["mse_latent_per_frame"] \
                + (metrics.get("ft_mse_latent", 0.0)
                   + metrics.get("ft_gp_nll", 0.0)) / cfg.seq_len_train
        epoch_mse = float(epoch_mse)          # one sync per epoch
        epoch_s = timer.stop()
        logger.log(epoch, {"epoch_mse": epoch_mse / cfg.epoch_size,
                           "frames_seen": (epoch + 1) * cfg.epoch_size
                           * cfg.batch_size,
                           "step_s": epoch_s / cfg.epoch_size}, kind="epoch")
        print("[%02d] mse loss: %.5f (%d)" % (
            epoch, epoch_mse / cfg.epoch_size,
            epoch * cfg.epoch_size * cfg.batch_size))

        if epoch % args.ckpt_every == 0 and is_coordinator():
            # coordinator-only writes: the plot computes from host-local
            # copies of the (fully-replicated) state, so non-coordinators
            # neither join a collective nor race on the files
            _plot(model, cfg, state, plot_fns, test_loader, epoch, jax, jnp,
                  save_gif, save_image)
            save_checkpoint(ckpt_path, cfg, state)
        if epoch % 10 == 0 and is_coordinator():
            print("log dir: %s" % cfg.log_dir)
    return 0


def _plot(model, cfg, state, plot_fns, test_loader, epoch, jax, jnp,
          save_gif, save_image):
    """Training-time qualitative eval (reference plot, train.py:256-335):
    5 samples, GP fork at frame 10, best-of-5-by-MSE grid + GIF."""
    import numpy as np
    x = jnp.asarray(test_loader.next_batch(epoch))
    # host-local copies: state may live replicated on a GLOBAL multi-host
    # mesh — np.asarray of a fully-replicated array is a local read, and the
    # rollout below then runs as a plain local computation on this process
    params = jax.tree.map(np.asarray, state.params)
    stats = jax.tree.map(np.asarray, state.stats)
    cache = model.gp_cache(params)
    key = jax.random.PRNGKey(epoch)
    gen = plot_fns.plot_samples(params, stats, cache, x, key)
    gen = np.asarray(gen)               # (5, n_eval, B, H, W, C)
    gt = np.asarray(x)[:cfg.n_eval]
    nrow = min(cfg.batch_size, 10)
    to_plot, gifs = [], [[] for _ in range(cfg.n_eval)]
    # seed ONCE per plot: the reference draws fresh np.random.randint per
    # row (train.py:346-351); reseeding inside the loop would show the
    # same 4 "random" samples on every row
    rs = np.random.RandomState(epoch)
    for b in range(nrow):
        to_plot.append([gt[t, b] for t in range(cfg.n_eval)])
        mse_s = ((gen[:, :cfg.n_eval, b] - gt[None, :, b]) ** 2
                 ).sum(axis=(1, 2, 3, 4))
        order = [int(np.argmin(mse_s))] + list(
            rs.randint(0, gen.shape[0], 4))
        for s in order:
            to_plot.append([gen[s, t, b] for t in range(cfg.n_eval)])
        for t in range(cfg.n_eval):
            gifs[t].append([gt[t, b]] + [gen[s, t, b] for s in order])
    save_image(f"{cfg.output_path}/sample_{epoch}.png", to_plot)
    save_gif(f"{cfg.output_path}/sample_{epoch}.gif", gifs)


if __name__ == "__main__":
    sys.exit(main())
