"""Parallel-layer tests on the virtual 8-device CPU mesh: mesh construction,
sample-parallel metrics sharding, and the global-id → (device, local) select
translation (SURVEY.md §4 'multi-chip without a cluster')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvg_tpu.config import DVGConfig
from dvg_tpu.generate.rollout import make_rollout_fns
from dvg_tpu.models.dvg import DVGModel
from dvg_tpu.parallel import make_mesh, shard_diverse_rollout


def test_distributed_init_noop(monkeypatch):
    """Single-host runs must be a silent no-op (no coordinator env)."""
    from dvg_tpu.parallel import distributed_init
    monkeypatch.delenv("DVG_COORDINATOR", raising=False)
    monkeypatch.delenv("DVG_MULTIHOST", raising=False)
    assert distributed_init() is False


def test_make_mesh():
    m = make_mesh([("data", 8)])
    assert m.shape == {"data": 8}
    m2 = make_mesh([("sample", 2), ("data", -1)])
    assert m2.shape == {"sample": 2, "data": 4}
    with pytest.raises(ValueError):
        make_mesh([("data", 99)])
    # -1 must absorb the rest EVENLY (silently idling devices is an error)
    with pytest.raises(ValueError, match="divide"):
        make_mesh([("sample", 3), ("data", -1)])
    with pytest.raises(ValueError, match="-1"):
        make_mesh([("a", -1), ("b", -1)])


@pytest.fixture(scope="module")
def tiny():
    cfg = DVGConfig(dataset="smmnist", channels=1, image_width=64,
                    batch_size=2, n_past=2, n_future=2, n_eval=4,
                    g_dim=8, rnn_size=16, num_inducing_points=4, nsample=8)
    model = DVGModel(cfg)
    params, stats = model.init(jax.random.PRNGKey(0))
    cache = model.gp_cache(params)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 2, 64, 64, 1))
    return cfg, model, params, stats, cache, x


def test_sample_parallel_metrics_and_select_translation(tiny):
    cfg, model, params, stats, cache, x = tiny
    n_dev, s_local = 4, 2
    mesh = make_mesh([("sample", n_dev)])
    local_fns = make_rollout_fns(model, cfg, nsample=s_local)
    sharded = shard_diverse_rollout(local_fns.diverse_metrics, mesh)
    key = jax.random.PRNGKey(5)
    met = sharded(params, stats, cache, x, key)
    assert met["ssim"].shape == (n_dev * s_local, 2, 2)   # (S, T', B)

    # per-device reference: fold the key like the shard_map body does
    for dev in range(2):
        ref = local_fns.diverse_metrics(params, stats, cache, x,
                                        jax.random.fold_in(key, dev))
        np.testing.assert_allclose(
            np.asarray(met["ssim"][dev * s_local:(dev + 1) * s_local]),
            np.asarray(ref["ssim"]), rtol=1e-5, atol=1e-6)

    # the CLI's global-id translation reproduces the scored future exactly
    g = 5                                   # device 2, local 1
    dev, loc = divmod(g, s_local)
    row = 1
    sel = local_fns.diverse_select(
        params, stats, cache, x[:, row:row + 1],
        jax.random.fold_in(key, dev), jnp.asarray([loc]),
        jnp.asarray([row]))
    frames_ref = local_fns.diverse(params, stats, cache, x,
                                   jax.random.fold_in(key, dev))
    np.testing.assert_allclose(np.asarray(sel[0, :, 0]),
                               np.asarray(frames_ref[loc, :, row]),
                               rtol=1e-4, atol=1e-5)


def test_shard_train_step_gspmd_matches_single_device(tiny):
    """`shard_train_step` is the GSPMD alternative to the explicit
    shard_map in train/step.py: jit with in/out shardings, XLA inserts the
    gradient all-reduce and partitions the BN batch reductions globally.
    Its results must match the single-device step exactly."""
    from dvg_tpu.parallel import shard_train_step
    from dvg_tpu.train.step import init_train_state, make_train_step_fn

    cfg, model, *_ = tiny
    cfg = cfg.replace(batch_size=4)
    _, state0, opts = init_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step_fn(model, cfg, opts)
    x = jax.random.uniform(
        jax.random.PRNGKey(1),
        (cfg.seq_len_train, cfg.batch_size, 64, 64, cfg.channels))

    ref_state, ref_metrics = jax.jit(step_fn)(state0, x)

    mesh = make_mesh([("data", 2)])
    _, state1, _ = init_train_state(cfg, jax.random.PRNGKey(0))
    sharded = shard_train_step(step_fn, mesh)
    got_state, got_metrics = sharded(state1, x)

    for k in ref_metrics:
        np.testing.assert_allclose(np.asarray(got_metrics[k]),
                                   np.asarray(ref_metrics[k]),
                                   rtol=2e-5, atol=1e-6, err_msg=k)
    # conv biases that feed a train-mode BatchNorm have MATHEMATICALLY zero
    # gradient (BN subtracts the per-channel batch mean), so their Adam
    # step-1 update is lr·noise/(|noise|+eps) ≈ ±lr of pure float noise —
    # graph-layout changes flip its sign. Compare those with an atol of a
    # few Adam steps; everything else stays tight.
    from jax.tree_util import tree_flatten_with_path
    ref_flat = tree_flatten_with_path(ref_state.params)[0]
    got_flat = tree_flatten_with_path(got_state.params)[0]
    for (path, a), (_, b) in zip(ref_flat, got_flat):
        keys = [getattr(p, "key", None) for p in path]
        a, b = np.asarray(a), np.asarray(b)
        diff = np.abs(b - a)
        # every element within a few Adam steps: a wrong/missing collective
        # shifts whole tensors by O(lr) and fails this
        assert diff.max() <= 3 * cfg.lr + 2e-5 * np.abs(a).max(), keys
        if "conv" in keys and keys[-1] == "b":
            # conv bias feeding train-mode BN: gradient is MATHEMATICALLY
            # zero (BN subtracts the batch mean), the Adam update is pure
            # ±lr float noise — only the bound above applies
            continue
        # elsewhere: tight agreement except isolated elements whose true
        # gradient is ~eps (Adam's g/(|g|+eps) flips their update sign
        # under any graph-layout change)
        # Elements whose gradient is ≳eps keep tight agreement; the ≲eps
        # tail (LSTM cells at init have a few % of such elements) flips
        # under any graph-layout change. Note step-1 Adam is g/(|g|+eps) —
        # near sign(g) — so the SHARP numeric check is the metrics equality
        # above (loss terms identical under GSPMD); this bounds structure.
        loose = diff > 1e-6 + 2e-5 * np.abs(a)
        assert loose.sum() <= max(2, a.size // 20), (keys, int(loose.sum()))


def test_2d_sample_data_mesh_layout_invariant(tiny):
    """2-D ('sample','data') mesh: batch rows shard too. Because per-row
    noise is keyed by the GLOBAL row id (row_offset threading), the result
    must be bit-for-layout identical to the 1-D sample-only sharding of the
    same futures — the data-axis layout must not change any number."""
    cfg, model, params, stats, cache, x = tiny
    n_samp, s_local, n_data = 2, 2, 2
    local_fns = make_rollout_fns(model, cfg, nsample=s_local)
    key = jax.random.PRNGKey(5)

    mesh1 = make_mesh([("sample", n_samp)],
                      devices=jax.devices()[:n_samp])
    met1 = shard_diverse_rollout(local_fns.diverse_metrics, mesh1)(
        params, stats, cache, x, key)

    mesh2 = make_mesh([("sample", n_samp), ("data", n_data)])
    met2 = shard_diverse_rollout(local_fns.diverse_metrics, mesh2,
                                 data_axis="data")(
        params, stats, cache, x, key)

    for k in ("ssim", "psnr", "mse"):
        assert met2[k].shape == (n_samp * s_local, 2, 2)
        np.testing.assert_allclose(np.asarray(met2[k]), np.asarray(met1[k]),
                                   rtol=1e-5, atol=1e-6)

    # and each shard matches a hand-built local call with the row offset
    b_local = x.shape[1] // n_data
    for s_dev in range(n_samp):
        for d_dev in range(n_data):
            ref = local_fns.diverse_metrics(
                params, stats, cache,
                x[:, d_dev * b_local:(d_dev + 1) * b_local],
                jax.random.fold_in(key, s_dev), d_dev * b_local)
            np.testing.assert_allclose(
                np.asarray(met2["ssim"][s_dev * s_local:(s_dev + 1) * s_local,
                                        :, d_dev * b_local:
                                        (d_dev + 1) * b_local]),
                np.asarray(ref["ssim"]), rtol=1e-5, atol=1e-6)


def test_shard_diverse_rollout_full_cov_rejects_data_sharding():
    """The full_cov guard lives at the MECHANISM (shard_diverse_rollout),
    so library callers — not just the CLI/export — cannot silently
    restrict the batch-correlated GP draw (generate_frames.py:170) to a
    data shard. A pure sample mesh (or data axis of size 1) stays legal."""
    mesh = make_mesh([("sample", 2), ("data", 4)])
    with pytest.raises(ValueError, match="full_cov"):
        shard_diverse_rollout(lambda *a: None, mesh, data_axis="data",
                              full_cov=True)
    # size-1 data axis carries the whole batch — legal
    m1 = make_mesh([("sample", 8), ("data", 1)])
    shard_diverse_rollout(lambda *a: None, m1, data_axis="data",
                          full_cov=True)
    # pure sample-parallel full_cov is legal (each device draws over the
    # full batch)
    m2 = make_mesh([("sample", 8)])
    shard_diverse_rollout(lambda *a: None, m2, full_cov=True)
