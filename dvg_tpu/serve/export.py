"""Ahead-of-time export of the serving paths — StableHLO via jax.export.

Production serving wants each rollout as a self-contained compiled
artifact: no model Python on the serving host, no retracing, stable
byte-level interface. `export_serving` closes the checkpoint's weights over
the chosen rollout entry point (so the artifact embeds them as constants),
traces it once, and serializes portable StableHLO; `load_serving` restores
a callable from the bytes alone.

Exported entry points (all pure; shapes fixed at export time):
  posterior        (x (T,B,H,W,C) f32)          -> frames (T,B,H,W,C) f32
  diverse_metrics  (x, key (2,) u32)            -> {ssim,psnr,mse:(S,T',B)}
  gp_trigger       (x, key)                     -> (frames, diagnostics)

The reference has no serving story at all — its generation entry is a
script that unpickles whole torch modules (generate_frames.py:43-72);
this is the TPU-native equivalent of shipping a compiled SavedModel.

CLI:  python -m dvg_tpu.serve.export <model_dir> <out.stablehlo> \
          [--entry posterior] [--nsample 100] [--batch 50] [--n_eval 105] \
          [--dtype bfloat16] [--platforms tpu,cpu]
"""

from __future__ import annotations

import json
import os
from typing import Sequence


def export_serving(model_dir: str, out_path: str, entry: str = "posterior",
                   nsample: int = None, batch_size: int = None,
                   n_eval: int = None, dtype: str = None,
                   platforms: Sequence[str] = None,
                   mesh_samples: int = 0, mesh_data: int = 0) -> str:
    """Export one serving entry point of a checkpoint to `out_path`
    (+ a .json sidecar with the geometry). Returns out_path.

    With `mesh_samples=N` (diverse_metrics only) the exported program is the
    SHARDED rollout: a shard_map over an N-device ('sample',) mesh, each
    device generating nsample/N futures with its own folded key
    (parallel/mesh.py::shard_diverse_rollout). With `mesh_data=M` as well,
    the mesh is 2-D ('sample',N)x('data',M): each device rolls out its
    sample slice over batch/M rows, with the global row-offset threaded so
    per-row noise stays a function of the GLOBAL row id (bit-comparable to
    the unsharded program). jax.export records the device assignment, so
    the artifact must be loaded in a runtime with at least N*M devices of
    the export platform; callers pass plain host arrays — load_serving
    commits them to the serving mesh (GSPMD reshards the batch onto the
    'data' axis inside the program)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from dvg_tpu.generate.rollout import make_rollout_fns
    from dvg_tpu.models.dvg import DVGModel
    from dvg_tpu.train import init_train_state, load_checkpoint
    from dvg_tpu.train.checkpoint import restore_state

    # load_checkpoint resolves directories itself (checkpoint.py) — pass
    # through so explicit non-.ckpt file paths (e.g. final.msgpack) work
    saved_cfg, payload = load_checkpoint(model_dir)
    cfg = saved_cfg.generation_override()
    if nsample:
        cfg = cfg.replace(nsample=nsample)
    if batch_size:
        cfg = cfg.replace(batch_size=batch_size)
    if n_eval:
        cfg = cfg.replace(n_eval=n_eval, n_future=n_eval - cfg.n_past)
    if dtype:
        cfg = cfg.replace(dtype=dtype)

    model = DVGModel(cfg)
    _, skeleton, _ = init_train_state(cfg, jax.random.PRNGKey(0))
    state = restore_state(skeleton, payload)   # reuse the single disk read
    params, stats = state.params, state.stats
    cache = model.gp_cache(params)
    fns = make_rollout_fns(model, cfg, nsample=cfg.nsample)

    x_spec = jax.ShapeDtypeStruct(
        (cfg.n_eval, cfg.batch_size, cfg.image_width, cfg.image_width,
         cfg.channels), jnp.float32)
    key_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)

    if (mesh_samples or mesh_data) and entry != "diverse_metrics":
        raise ValueError(
            "mesh_samples/mesh_data apply to the diverse_metrics entry")
    if mesh_data and not mesh_samples:
        raise ValueError("mesh_data requires mesh_samples (use "
                         "mesh_samples=1 for a pure data-sharded export)")
    # NB full_cov_sampling with mesh_data>1 is rejected below by
    # parallel/mesh.py::shard_diverse_rollout (guard lives at the mechanism)

    if entry == "posterior":
        def serving_fn(x):
            return fns.posterior(params, stats, cache, x)
        specs = (x_spec,)
    elif entry == "diverse_metrics" and mesh_samples:
        from dvg_tpu.parallel import make_mesh, shard_diverse_rollout

        if cfg.nsample % mesh_samples:
            raise ValueError(
                f"nsample {cfg.nsample} not divisible by {mesh_samples}")
        if mesh_data and cfg.batch_size % mesh_data:
            raise ValueError(
                f"batch {cfg.batch_size} not divisible by {mesh_data}")
        axes = [("sample", mesh_samples)]
        if mesh_data:
            axes.append(("data", mesh_data))
        mesh = make_mesh(axes)
        local_fns = make_rollout_fns(
            model, cfg, nsample=cfg.nsample // mesh_samples)
        sharded = shard_diverse_rollout(
            local_fns.diverse_metrics, mesh,
            data_axis="data" if mesh_data else None,
            full_cov=cfg.full_cov_sampling)

        def serving_fn(x, key):
            return sharded(params, stats, cache, x, key)
        specs = (x_spec, key_spec)
    elif entry == "diverse_metrics":
        def serving_fn(x, key):
            return fns.diverse_metrics(params, stats, cache, x, key)
        specs = (x_spec, key_spec)
    elif entry == "gp_trigger":
        def serving_fn(x, key):
            return fns.gp_trigger(params, stats, cache, x, key)
        specs = (x_spec, key_spec)
    else:
        raise ValueError(f"unknown entry {entry!r}")

    kw = {}
    if platforms:
        kw["platforms"] = list(platforms)
    exported = jax_export.export(jax.jit(serving_fn), **kw)(*specs)
    blob = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(blob)
    with open(out_path + ".json", "w") as f:
        json.dump({"entry": entry, "config": cfg.to_dict(),
                   "platforms": list(exported.platforms),
                   "in_shapes": [list(s.shape) for s in specs],
                   "mesh_samples": mesh_samples or None,
                   "mesh_data": mesh_data or None,
                   "nr_devices": exported.nr_devices,
                   "bytes": len(blob)}, f, indent=1)
    return out_path


def load_serving(path: str):
    """Bytes → callable. The artifact is self-contained (weights embedded);
    calling it jit-executes the deserialized StableHLO."""
    from jax import export as jax_export

    import jax

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    if exported.nr_devices <= 1:
        # jit once: bare `exported.call` re-traces (and re-lowers the
        # embedded StableHLO) on EVERY invocation — measured 3x the live-jit
        # latency on TPU; under jit the custom call caches like any program
        return jax.jit(exported.call)
    # A sharded artifact (mesh_samples export) must run under the SAME
    # device-assignment size it was exported for; commit replicated inputs
    # to an nr_devices mesh so the call context matches (jax.export refuses
    # a 1-device context for an N-device program).
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    if len(jax.devices()) < exported.nr_devices:
        raise ValueError(
            f"artifact was exported for {exported.nr_devices} devices; "
            f"runtime has {len(jax.devices())}")
    mesh = Mesh(np.asarray(jax.devices()[:exported.nr_devices]), ("serve",))
    repl = NamedSharding(mesh, PartitionSpec())
    try:
        # commit each input with the sharding the program was EXPORTED
        # with (a mesh_data export shards the batch rows — blanket
        # replication would move nr_devices x the bytes every call)
        in_sh = [s if s is not None else repl
                 for s in exported.in_shardings_jax(mesh)]
    except Exception as e:
        import warnings
        warnings.warn(
            "load_serving: could not recover the artifact's input "
            f"shardings ({e!r}); falling back to replicating every input — "
            "a mesh_data artifact will move nr_devices x the batch bytes "
            "per call")
        in_sh = None

    jitted = jax.jit(exported.call)     # same retrace-per-call avoidance

    def call(*args):
        flat, tree = jax.tree.flatten(args)
        if in_sh is not None and len(in_sh) == len(flat):
            flat = [jax.device_put(a, s) for a, s in zip(flat, in_sh)]
        else:
            flat = [jax.device_put(a, repl) for a in flat]
        return jitted(*jax.tree.unflatten(tree, flat))

    return call


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        description="Export a DVG-TPU serving entry point to StableHLO")
    ap.add_argument("model_dir")
    ap.add_argument("out")
    ap.add_argument("--entry", default="posterior",
                    choices=["posterior", "diverse_metrics", "gp_trigger"])
    ap.add_argument("--nsample", type=int, default=0)
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--n_eval", type=int, default=0)
    ap.add_argument("--dtype", default="")
    ap.add_argument("--platforms", default="",
                    help="comma list, e.g. tpu,cpu (default: current)")
    ap.add_argument("--mesh_samples", type=int, default=0,
                    help="export the N-device sample-sharded rollout "
                         "(diverse_metrics only)")
    ap.add_argument("--mesh_data", type=int, default=0,
                    help="additionally shard batch rows over M devices — "
                         "a 2-D ('sample',N)x('data',M) serving mesh")
    a = ap.parse_args(argv)
    out = export_serving(
        a.model_dir, a.out, entry=a.entry, nsample=a.nsample or None,
        batch_size=a.batch or None, n_eval=a.n_eval or None,
        dtype=a.dtype or None,
        platforms=[p for p in a.platforms.split(",") if p] or None,
        mesh_samples=a.mesh_samples, mesh_data=a.mesh_data)
    print("wrote", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
