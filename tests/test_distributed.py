"""A REAL multi-process (multi-host posture) run — SURVEY.md §5.8.

Spawns TWO fresh python processes, each with 4 virtual CPU devices, joined
through `jax.distributed.initialize` via the DVG_COORDINATOR env contract
(parallel/mesh.py:distributed_init). Each process runs the ACTUAL training
CLI end-to-end on the resulting 8-device global mesh: per-process data
feeding (Loader._build_process_local → jax.make_array_from_process_local_
data), the shard_map DP train step psumming across the process boundary,
and the coordinator-only write guards (checkpoint / metrics.jsonl / plots).

Asserts:
  * both processes complete and the coordinator's checkpoint exists;
  * the non-coordinator wrote NOTHING (guards, not luck);
  * the 2-process global-mesh training matches a single-process run of the
    SAME 8-device mesh config: identical loss metrics, and post-step
    parameters equal up to Adam's noise amplification on mathematically-
    zero-gradient leaves (same comparison contract as
    test_parallel.test_shard_train_step_gspmd_matches_single_device).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CLI_ARGS = ["--dataset", "smmnist", "--data_root", "/tmp/nodata",
            "--niter", "1", "--epoch_size", "2", "--batch_size", "8",
            "--n_past", "2", "--n_future", "2", "--n_eval", "6",
            "--g_dim", "8", "--rnn_size", "16", "--ckpt_every", "1",
            "--data_threads", "1"]

WORKER = """
import sys, os
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from dvg_tpu.parallel import distributed_init
assert distributed_init(), "DVG_COORDINATOR contract did not activate"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert len(jax.local_devices()) == 4
from dvg_tpu.cli import train as T
rc = T.main({cli_args!r} + ["--output_path", sys.argv[1],
                            "--log_dir", sys.argv[1] + "/logs"]
            + sys.argv[2:])
assert rc == 0
print("WORKER_OK process", jax.process_index())
"""


EVAL_WORKER = """
import sys, os
sys.path.insert(0, {repo!r})
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from dvg_tpu.parallel import (distributed_init, make_mesh, replicate_to_mesh,
                              shard_diverse_rollout)
assert distributed_init()
assert jax.process_count() == 2 and jax.device_count() == 8
import jax.numpy as jnp
from dvg_tpu.config import DVGConfig
from dvg_tpu.models.dvg import DVGModel
from dvg_tpu.generate.rollout import make_rollout_fns

cfg = DVGConfig(dataset="smmnist", channels=1, image_width=64, batch_size=2,
                n_past=2, n_future=14, n_eval=16, g_dim=8, rnn_size=16,
                num_inducing_points=4, nsample=8)
model = DVGModel(cfg)
params, stats = model.init(jax.random.PRNGKey(0))
cache = model.gp_cache(params)
x = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (16, 2, 64, 64, 1)))
key = np.asarray(jax.random.PRNGKey(2))

mesh = make_mesh([("sample", 8)])          # spans both processes
local_fns = make_rollout_fns(model, cfg, nsample=1)
metrics_fn = shard_diverse_rollout(local_fns.diverse_metrics, mesh)
args = replicate_to_mesh((params, stats, cache, x, key), mesh)
# pre-compile + coordination-service barrier (Gloo ctx init budget is 30 s)
metrics_fn.lower(*args).compile()
from jax._src import distributed as _dist
_dist.global_state.client.wait_at_barrier("dvg_eval_precompile", 1200000)
out = metrics_fn(*args)
shards = {{}}
for name, arr in out.items():
    for s in arr.addressable_shards:
        shards[f"{{name}}_{{s.index[0].start}}"] = np.asarray(s.data)
np.savez(sys.argv[1], **shards)
print("EVAL_WORKER_OK", jax.process_index())
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env(port: int, pid: int) -> dict:
    """Environment for one spawned worker: 4 virtual CPU devices and the
    DVG_COORDINATOR contract. The device-count rewrite substitutes the
    flag's VALUE whatever it inherits (a literal 'device_count=8' replace
    would silently no-op on e.g. an inherited =16)."""
    import re
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" in flags:
        flags = re.sub(r"(xla_force_host_platform_device_count)=\d+",
                       r"\1=4", flags)
    else:
        flags += " --xla_force_host_platform_device_count=4"
    env["XLA_FLAGS"] = flags.strip()
    env["DVG_COORDINATOR"] = f"localhost:{port}"
    env["DVG_NUM_PROCESSES"] = "2"
    env["DVG_PROCESS_ID"] = str(pid)
    return env


def _run_workers(tmp_path, script, argvs, port, tag, timeout=900):
    """Spawn one worker per argv list and wait for all; stdout goes to a
    FILE per worker (workers rendezvous at distributed barriers — with a
    PIPE, a chatty worker filling the ~64KB buffer while the parent waits
    on its sibling would deadlock until the timeout). Asserts rc==0 and
    the tag line; returns each worker's full log."""
    procs, logfiles = [], []
    for pid, argv in enumerate(argvs):
        lf = open(str(tmp_path / f"worker_{tag}_{pid}.log"), "w+")
        logfiles.append(lf)
        procs.append(subprocess.Popen(
            [sys.executable, script] + list(argv),
            env=_worker_env(port, pid),
            stdout=lf, stderr=subprocess.STDOUT, text=True))
    try:
        for p in procs:
            try:
                p.wait(timeout=timeout)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
    finally:
        logs = []
        for lf in logfiles:
            lf.seek(0)
            logs.append(lf.read())
            lf.close()
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0 and tag in log, (
            f"{tag} process {pid} failed:\n{log[-4000:]}")
    return logs


@pytest.mark.perf        # wall-clock heavy: 2 concurrent CPU compiles
def test_two_process_distributed_training(tmp_path):
    port = _free_port()
    script = str(tmp_path / "worker.py")
    with open(script, "w") as f:
        f.write(WORKER.format(repo=REPO, cli_args=CLI_ARGS))

    outs = [str(tmp_path / f"proc{pid}") for pid in range(2)]
    _run_workers(tmp_path, script, [[o] for o in outs], port, "WORKER_OK")

    # coordinator wrote the artifacts; the other process wrote NOTHING
    ckpt = os.path.join(outs[0], "model.ckpt")
    assert os.path.exists(ckpt)
    assert os.path.exists(os.path.join(outs[0], "logs", "metrics.jsonl"))
    assert os.path.exists(os.path.join(outs[0], "sample_0.gif"))
    assert not os.path.exists(outs[1]), os.listdir(outs[1])

    # single-process run of the SAME config on this test process's own
    # 8-device mesh → the reference numerics
    from dvg_tpu.cli import train as T
    ref_dir = str(tmp_path / "single")
    assert T.main(CLI_ARGS + ["--output_path", ref_dir,
                              "--log_dir", ref_dir + "/logs"]) == 0

    from dvg_tpu.train.checkpoint import load_checkpoint
    _, got = load_checkpoint(ckpt)
    _, ref = load_checkpoint(os.path.join(ref_dir, "model.ckpt"))
    # loss metrics logged per epoch must agree tightly
    with open(os.path.join(outs[0], "logs", "metrics.jsonl")) as f:
        got_m = [json.loads(l) for l in f]
    with open(os.path.join(ref_dir, "logs", "metrics.jsonl")) as f:
        ref_m = [json.loads(l) for l in f]
    # step 2's loss runs on step-1-updated params, which already carry
    # Adam's ±lr amplification of near-eps-gradient float noise (cross-
    # process reduction orders differ from single-host) — observed ~4e-4
    # relative; a data-path or collective-semantics bug shows up at ≳5e-3
    np.testing.assert_allclose(got_m[0]["epoch_mse"], ref_m[0]["epoch_mse"],
                               rtol=2e-3)

    from jax.tree_util import tree_flatten_with_path
    got_flat = tree_flatten_with_path(got["params"])[0]
    ref_flat = tree_flatten_with_path(ref["params"])[0]
    from dvg_tpu.config import DVGConfig
    lr = DVGConfig().lr          # CLI_ARGS passes no --lr: bound tracks
    #                              the config default the workers ran with
    for (path, a), (_, b) in zip(ref_flat, got_flat):
        keys = [getattr(p, "key", None) for p in path]
        a, b = np.asarray(a), np.asarray(b)
        diff = np.abs(b - a)
        # worst honest per-element divergence over the 2 steps is a sign
        # flip both times: 2·steps·lr
        assert diff.max() <= 2 * 2 * lr * 1.1 + 2e-5 * np.abs(a).max(), keys
        if "conv" in keys and keys[-1] == "b":
            continue          # BN-shadowed bias: gradient ≡ 0, update noise
        # two compounding Adam steps: step-1's ±lr amplification of
        # near-eps-gradient noise perturbs step-2's gradients everywhere,
        # so "tight" after 2 steps means within ~lr/20; an unsynced
        # gradient (the real failure mode) diverges by the full ±lr per
        # step on most elements and trips both this and the max bound
        loose = diff > 1e-4 + np.abs(a) * 1e-3
        assert loose.sum() <= max(2, a.size // 20), (keys, int(loose.sum()))

    # --resume round: only the coordinator HAS a checkpoint (writes are
    # coordinator-only) — the resumed state must broadcast to the peer or
    # the two processes would train different epoch ranges from different
    # params (cli/train.py's broadcast_one_to_all path)
    port2 = _free_port()
    logs2 = _run_workers(
        tmp_path, script,
        [[outs[pid], "--resume", "--niter", "2"] for pid in range(2)],
        port2, "WORKER_OK")
    for pid, log in enumerate(logs2):
        # BOTH processes must resume at epoch 1 — the non-coordinator has
        # no local checkpoint and gets the state via the broadcast
        assert "resuming at epoch 1" in log, f"process {pid}:\n{log[-2000:]}"


@pytest.mark.perf
def test_two_process_sample_parallel_eval(tmp_path):
    """Sample-parallel diverse EVAL across two processes: an 8-device
    ('sample',) mesh spanning both, shard_map metrics with per-device key
    folding, inputs lifted via replicate_to_mesh. Every process's
    addressable sample shards must equal the single-process run of the SAME
    mesh program (pure forward — tight tolerance)."""
    port = _free_port()
    script = str(tmp_path / "eval_worker.py")
    with open(script, "w") as f:
        f.write(EVAL_WORKER.format(repo=REPO))

    outs = [str(tmp_path / f"eval{pid}.npz") for pid in range(2)]
    _run_workers(tmp_path, script, [[o] for o in outs], port,
                 "EVAL_WORKER_OK")

    # single-process reference on this test process's own 8-device mesh
    import jax
    import numpy as np2
    from dvg_tpu.config import DVGConfig
    from dvg_tpu.generate.rollout import make_rollout_fns
    from dvg_tpu.models.dvg import DVGModel
    from dvg_tpu.parallel import make_mesh, shard_diverse_rollout

    cfg = DVGConfig(dataset="smmnist", channels=1, image_width=64,
                    batch_size=2, n_past=2, n_future=14, n_eval=16,
                    g_dim=8, rnn_size=16, num_inducing_points=4, nsample=8)
    model = DVGModel(cfg)
    params, stats = model.init(jax.random.PRNGKey(0))
    cache = model.gp_cache(params)
    x = np2.asarray(jax.random.uniform(jax.random.PRNGKey(1),
                                       (16, 2, 64, 64, 1)))
    key = np2.asarray(jax.random.PRNGKey(2))
    mesh = make_mesh([("sample", 8)])
    local_fns = make_rollout_fns(model, cfg, nsample=1)
    metrics_fn = shard_diverse_rollout(local_fns.diverse_metrics, mesh)
    ref = jax.tree.map(np2.asarray,
                       dict(metrics_fn(params, stats, cache, x, key)))

    got = {}
    for path in outs:
        with np2.load(path) as z:
            got.update({k: z[k] for k in z.files})
    # EVERY addressable sample shard from both processes (8 devices × 1
    # sample each) must match — not just the processes' first shards
    assert len([k for k in got if k.startswith("ssim_")]) == 8
    for name in ("ssim", "psnr", "mse"):
        for k, shard in got.items():
            if not k.startswith(name + "_"):
                continue
            start = int(k[len(name) + 1:])
            np2.testing.assert_allclose(
                shard, ref[name][start:start + shard.shape[0]],
                rtol=1e-5, atol=1e-6, err_msg=k)


EVAL2D_WORKER = """
import sys, os
sys.path.insert(0, {repo!r})
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from dvg_tpu.parallel import (distributed_init, make_mesh, replicate_to_mesh,
                              shard_diverse_rollout)
assert distributed_init()
assert jax.process_count() == 2 and jax.device_count() == 8
from jax.sharding import NamedSharding, PartitionSpec as P
from dvg_tpu.config import DVGConfig
from dvg_tpu.models.dvg import DVGModel
from dvg_tpu.generate.rollout import make_rollout_fns

cfg = DVGConfig(dataset="smmnist", channels=1, image_width=64, batch_size=4,
                n_past=2, n_future=10, n_eval=12, g_dim=8, rnn_size=16,
                num_inducing_points=4, nsample=4)
model = DVGModel(cfg)
params, stats = model.init(jax.random.PRNGKey(0))
cache = model.gp_cache(params)
x_full = np.asarray(jax.random.uniform(jax.random.PRNGKey(1),
                                       (12, 4, 64, 64, 1)))
key = np.asarray(jax.random.PRNGKey(2))

# 'data' leads so its axis IS the process boundary: row 0 = proc 0's devices
mesh = make_mesh([("data", 2), ("sample", 4)])
local_fns = make_rollout_fns(model, cfg, nsample=1)
metrics_fn = shard_diverse_rollout(local_fns.diverse_metrics, mesh,
                                   data_axis="data")
# per-process rows of the global eval batch (NOT replicated): this process
# owns global rows [2*pid, 2*pid+2) — row-offset noise meets process-local
# feeding here
pid = jax.process_index()
x_local = x_full[:, 2 * pid:2 * pid + 2]
xg = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(None, "data")), x_local)
params, stats, cache, keyg = replicate_to_mesh((params, stats, cache, key),
                                               mesh)
metrics_fn.lower(params, stats, cache, xg, keyg).compile()
from jax._src import distributed as _dist
_dist.global_state.client.wait_at_barrier("dvg_eval2d_precompile", 1200000)
out = metrics_fn(params, stats, cache, xg, keyg)
shards = {{}}
for name, arr in out.items():
    for s in arr.addressable_shards:
        s0 = s.index[0].start or 0
        s2 = s.index[2].start or 0
        shards[f"{{name}}_{{s0}}_{{s2}}"] = np.asarray(s.data)
np.savez(sys.argv[1], **shards)
print("EVAL2D_WORKER_OK", jax.process_index())
"""


@pytest.mark.perf
def test_two_process_2d_sample_data_mesh_eval(tmp_path):
    """The one sharding combination a 1-D mesh test can't reach: a
    ('data',2)x('sample',4) mesh across TWO processes where each process
    feeds ONLY its own batch rows (make_array_from_process_local_data) AND
    shards the sample sweep — global-row-id noise, row offsets, and
    process-local feeding all at once. Every (sample, row) shard must equal
    the single-process run of the same mesh program."""
    port = _free_port()
    script = str(tmp_path / "eval2d_worker.py")
    with open(script, "w") as f:
        f.write(EVAL2D_WORKER.format(repo=REPO))

    outs = [str(tmp_path / f"eval2d_{pid}.npz") for pid in range(2)]
    _run_workers(tmp_path, script, [[o] for o in outs], port,
                 "EVAL2D_WORKER_OK")

    # single-process reference: the SAME 2-D mesh program on this test
    # process's own 8 devices
    import jax

    from dvg_tpu.config import DVGConfig
    from dvg_tpu.generate.rollout import make_rollout_fns
    from dvg_tpu.models.dvg import DVGModel
    from dvg_tpu.parallel import make_mesh, shard_diverse_rollout

    cfg = DVGConfig(dataset="smmnist", channels=1, image_width=64,
                    batch_size=4, n_past=2, n_future=10, n_eval=12,
                    g_dim=8, rnn_size=16, num_inducing_points=4, nsample=4)
    model = DVGModel(cfg)
    params, stats = model.init(jax.random.PRNGKey(0))
    cache = model.gp_cache(params)
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(1),
                                      (12, 4, 64, 64, 1)))
    key = np.asarray(jax.random.PRNGKey(2))
    mesh = make_mesh([("data", 2), ("sample", 4)])
    local_fns = make_rollout_fns(model, cfg, nsample=1)
    metrics_fn = shard_diverse_rollout(local_fns.diverse_metrics, mesh,
                                       data_axis="data")
    ref = jax.tree.map(np.asarray,
                       dict(metrics_fn(params, stats, cache, x, key)))

    got = {}
    for path in outs:
        with np.load(path) as z:
            got.update({k: z[k] for k in z.files})
    # every (sample, row-shard) block from both processes matches
    assert len([k for k in got if k.startswith("ssim_")]) == 8
    for name in ("ssim", "psnr", "mse"):
        for k, shard in got.items():
            if not k.startswith(name + "_"):
                continue
            s0, s2 = (int(v) for v in k[len(name) + 1:].split("_"))
            np.testing.assert_allclose(
                shard, ref[name][s0:s0 + shard.shape[0], :,
                                 s2:s2 + shard.shape[2]],
                rtol=1e-5, atol=1e-6, err_msg=k)


GEN_WORKER = """
import sys, os
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from dvg_tpu.parallel import distributed_init
assert distributed_init()
assert jax.process_count() == 2 and jax.device_count() == 8
from dvg_tpu.cli import generate as G
rc = G.main(["--model_dir", sys.argv[1], "--dataset", "smmnist",
             "--data_root", "/tmp/nodata", "--log_dir", sys.argv[2],
             "--nsample", "8", "--mesh_samples", "8", "--num_batches", "1",
             "--override_n_eval", "12", "--override_batch_size", "2",
             "--gif_rows", "1"])
assert rc == 0
print("GEN_WORKER_OK", jax.process_index())
"""


@pytest.mark.perf
def test_two_process_generate_cli(tmp_path):
    """The generation CLI end-to-end across two processes: --mesh_samples 8
    spans both processes' devices, metrics gather back to every host, only
    the coordinator writes (npz/jsonl/GIF), and the scores equal a
    single-process run of the same CLI."""
    import jax

    from dvg_tpu.config import DVGConfig
    from dvg_tpu.train.checkpoint import save_checkpoint
    from dvg_tpu.train.step import init_train_state

    cfg = DVGConfig(dataset="smmnist", channels=1, image_width=64,
                    batch_size=2, n_past=2, n_future=10, n_eval=12,
                    g_dim=8, rnn_size=16, num_inducing_points=4)
    _, state, _ = init_train_state(cfg, jax.random.PRNGKey(0))
    model_dir = str(tmp_path / "model")
    save_checkpoint(model_dir, cfg, state)

    port = _free_port()
    script = str(tmp_path / "gen_worker.py")
    with open(script, "w") as f:
        f.write(GEN_WORKER.format(repo=REPO))

    logdirs = [str(tmp_path / f"gen{pid}") for pid in range(2)]
    _run_workers(tmp_path, script, [[model_dir, d] for d in logdirs], port,
                 "GEN_WORKER_OK")

    assert os.path.exists(os.path.join(logdirs[0], "eval_batch0.npz"))
    assert os.path.exists(os.path.join(logdirs[0], "metrics.jsonl"))
    assert any(f.endswith(".gif") for f in os.listdir(logdirs[0]))
    assert not os.path.exists(logdirs[1])

    # single-process CLI run of the same eval → identical scores
    from dvg_tpu.cli import generate as G
    ref_dir = str(tmp_path / "gen_single")
    assert G.main(["--model_dir", model_dir, "--dataset", "smmnist",
                   "--data_root", "/tmp/nodata", "--log_dir", ref_dir,
                   "--nsample", "8", "--mesh_samples", "8",
                   "--num_batches", "1", "--override_n_eval", "12",
                   "--override_batch_size", "2", "--gif_rows", "1"]) == 0
    with np.load(os.path.join(logdirs[0], "eval_batch0.npz")) as a, \
            np.load(os.path.join(ref_dir, "eval_batch0.npz")) as b:
        np.testing.assert_allclose(a["ssim"], b["ssim"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(a["psnr"], b["psnr"],
                                   rtol=1e-5, atol=1e-5)
