"""Serving export roundtrip: checkpoint → StableHLO artifact → load from
bytes alone → outputs equal the live rollout (dvg_tpu/serve/export.py)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dvg_tpu.config import DVGConfig
from dvg_tpu.generate.rollout import make_rollout_fns
from dvg_tpu.models.dvg import DVGModel
from dvg_tpu.serve import export_serving, load_serving
from dvg_tpu.train.checkpoint import save_checkpoint
from dvg_tpu.train.step import init_train_state

CFG = DVGConfig(dataset="smmnist", channels=1, image_width=64,
                batch_size=2, n_past=2, n_future=10, n_eval=12,
                g_dim=8, rnn_size=16, num_inducing_points=4, nsample=3)


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("serve") / "model")
    _, state, _ = init_train_state(CFG, jax.random.PRNGKey(0))
    save_checkpoint(d, CFG, state)
    return d


def _x():
    return jax.random.uniform(jax.random.PRNGKey(5),
                              (12, 2, 64, 64, 1), jnp.float32)


def test_export_posterior_roundtrip(ckpt_dir, tmp_path):
    out = str(tmp_path / "posterior.stablehlo")
    export_serving(ckpt_dir, out, entry="posterior", nsample=CFG.nsample,
                   batch_size=2, n_eval=12)
    assert os.path.getsize(out) > 0
    side = json.load(open(out + ".json"))
    assert side["entry"] == "posterior"
    assert side["in_shapes"] == [[12, 2, 64, 64, 1]]

    served = load_serving(out)
    x = _x()
    got = np.asarray(served(x))

    model = DVGModel(CFG)
    from dvg_tpu.train import init_train_state as ITS, load_checkpoint
    _, skeleton, _ = ITS(CFG, jax.random.PRNGKey(0))
    _, state = load_checkpoint(os.path.join(ckpt_dir, "model.ckpt"),
                               target_state=skeleton)
    fns = make_rollout_fns(model, CFG, nsample=CFG.nsample)
    ref = np.asarray(fns.posterior(state.params, state.stats,
                                   model.gp_cache(state.params), x))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_export_diverse_metrics_roundtrip(ckpt_dir, tmp_path):
    out = str(tmp_path / "metrics.stablehlo")
    export_serving(ckpt_dir, out, entry="diverse_metrics",
                   nsample=CFG.nsample, batch_size=2, n_eval=12)
    served = load_serving(out)
    x = _x()
    key = jax.random.PRNGKey(9)
    got = jax.tree.map(np.asarray, served(x, key))
    assert set(got) == {"ssim", "psnr", "mse"}
    assert got["ssim"].shape == (CFG.nsample, 10, 2)

    model = DVGModel(CFG)
    from dvg_tpu.train import init_train_state as ITS, load_checkpoint
    _, skeleton, _ = ITS(CFG, jax.random.PRNGKey(0))
    _, state = load_checkpoint(os.path.join(ckpt_dir, "model.ckpt"),
                               target_state=skeleton)
    fns = make_rollout_fns(model, CFG, nsample=CFG.nsample)
    ref = jax.tree.map(np.asarray, fns.diverse_metrics(
        state.params, state.stats, model.gp_cache(state.params), x, key))
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)

def test_export_sharded_diverse_metrics(ckpt_dir, tmp_path):
    """mesh_samples=N exports the SHARDED rollout (shard_map over an
    N-device ('sample',) mesh). The loaded artifact must equal a manual
    per-device emulation: device d folds the key by d and generates
    nsample/N futures; outputs concatenate over samples."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    out = str(tmp_path / "sharded.stablehlo")
    export_serving(ckpt_dir, out, entry="diverse_metrics",
                   nsample=4, batch_size=2, n_eval=12, mesh_samples=2)
    side = json.load(open(out + ".json"))
    assert side["mesh_samples"] == 2
    assert side["nr_devices"] == 2

    served = load_serving(out)
    x = _x()
    key = jax.random.PRNGKey(13)
    got = jax.tree.map(np.asarray, served(x, key))
    assert got["ssim"].shape == (4, 10, 2)

    cfg = CFG.replace(nsample=4)
    model = DVGModel(cfg)
    from dvg_tpu.train import init_train_state as ITS, load_checkpoint
    _, skeleton, _ = ITS(cfg, jax.random.PRNGKey(0))
    _, state = load_checkpoint(os.path.join(ckpt_dir, "model.ckpt"),
                               target_state=skeleton)
    local_fns = make_rollout_fns(model, cfg, nsample=2)
    emu = jax.jit(local_fns.diverse_metrics)
    cache = model.gp_cache(state.params)
    ref = {k: [] for k in ("ssim", "psnr", "mse")}
    for d in range(2):
        kd = jax.random.fold_in(key, d)
        m = emu(state.params, state.stats, cache, x, kd)
        for k in ref:
            ref[k].append(np.asarray(m[k]))
    for k in ref:
        np.testing.assert_allclose(got[k], np.concatenate(ref[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_export_sharded_rejects_bad_args(ckpt_dir, tmp_path):
    with pytest.raises(ValueError, match="diverse_metrics"):
        export_serving(ckpt_dir, str(tmp_path / "x.stablehlo"),
                       entry="posterior", mesh_samples=2)
    with pytest.raises(ValueError, match="not divisible"):
        export_serving(ckpt_dir, str(tmp_path / "y.stablehlo"),
                       entry="diverse_metrics", nsample=3, mesh_samples=2)


def test_export_full_cov_rejects_mesh_data(tmp_path):
    """A full_cov checkpoint must refuse a mesh_data>1 export — the same
    guard the generation CLI applies: sharding batch rows would silently
    correlate the 'batch-correlated' draw only within each shard."""
    d = str(tmp_path / "model_fc")
    cfg_fc = CFG.replace(full_cov_sampling=True)
    _, state, _ = init_train_state(cfg_fc, jax.random.PRNGKey(0))
    save_checkpoint(d, cfg_fc, state)
    with pytest.raises(ValueError, match="full_cov"):
        export_serving(d, str(tmp_path / "z.stablehlo"),
                       entry="diverse_metrics", nsample=4, batch_size=2,
                       mesh_samples=2, mesh_data=2)
    # sample-only sharding of a full_cov checkpoint stays legal
    out = export_serving(d, str(tmp_path / "ok.stablehlo"),
                         entry="diverse_metrics", nsample=4, batch_size=2,
                         n_eval=12, mesh_samples=2)
    assert os.path.getsize(out) > 0


def test_export_gp_trigger_roundtrip(ckpt_dir, tmp_path):
    """The third serving entry (GPtrigger_gen, generate_frames.py:249-300)
    roundtrips: exported frames AND trigger diagnostics equal the live
    rollout."""
    out = str(tmp_path / "trigger.stablehlo")
    export_serving(ckpt_dir, out, entry="gp_trigger",
                   batch_size=2, n_eval=12)
    assert json.load(open(out + ".json"))["entry"] == "gp_trigger"
    served = load_serving(out)
    x = _x()
    key = jax.random.PRNGKey(21)
    g_frames, g_diag = served(x, key)

    model = DVGModel(CFG)
    from dvg_tpu.train import init_train_state as ITS, load_checkpoint
    _, skeleton, _ = ITS(CFG, jax.random.PRNGKey(0))
    _, state = load_checkpoint(os.path.join(ckpt_dir, "model.ckpt"),
                               target_state=skeleton)
    fns = make_rollout_fns(model, CFG, nsample=CFG.nsample)
    r_frames, r_diag = fns.gp_trigger(state.params, state.stats,
                                      model.gp_cache(state.params), x, key)
    np.testing.assert_allclose(np.asarray(g_frames), np.asarray(r_frames),
                               rtol=1e-5, atol=1e-6)
    for k in r_diag:
        np.testing.assert_allclose(np.asarray(g_diag[k]),
                                   np.asarray(r_diag[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_export_2d_mesh_diverse_metrics(ckpt_dir, tmp_path):
    """mesh_samples=2 x mesh_data=2: the exported program shards futures
    AND batch rows over a 2-D ('sample',2)x('data',2) mesh, threading each
    shard's global row offset so per-row noise is a function of the GLOBAL
    row id. The artifact must equal a per-(sample, data)-shard emulation
    of the unsharded rollout."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    out = str(tmp_path / "mesh2d.stablehlo")
    export_serving(ckpt_dir, out, entry="diverse_metrics",
                   nsample=4, batch_size=2, n_eval=12,
                   mesh_samples=2, mesh_data=2)
    side = json.load(open(out + ".json"))
    assert (side["mesh_samples"], side["mesh_data"],
            side["nr_devices"]) == (2, 2, 4)

    served = load_serving(out)
    x = _x()
    key = jax.random.PRNGKey(17)
    got = jax.tree.map(np.asarray, served(x, key))
    assert got["ssim"].shape == (4, 10, 2)

    cfg = CFG.replace(nsample=4)
    model = DVGModel(cfg)
    from dvg_tpu.train import init_train_state as ITS, load_checkpoint
    _, skeleton, _ = ITS(cfg, jax.random.PRNGKey(0))
    _, state = load_checkpoint(os.path.join(ckpt_dir, "model.ckpt"),
                               target_state=skeleton)
    local_fns = make_rollout_fns(model, cfg, nsample=2)
    emu = jax.jit(local_fns.diverse_metrics)
    cache = model.gp_cache(state.params)
    ref = {k: np.zeros_like(got[k]) for k in got}
    for si in range(2):
        ks = jax.random.fold_in(key, si)
        for di in range(2):
            xl = x[:, di:di + 1]
            m = emu(state.params, state.stats, cache, xl, ks, di)
            for k in ref:
                ref[k][si * 2:(si + 1) * 2, :, di:di + 1] = np.asarray(m[k])
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)


def test_export_2d_mesh_rejects_bad_args(ckpt_dir, tmp_path):
    with pytest.raises(ValueError, match="requires mesh_samples"):
        export_serving(ckpt_dir, str(tmp_path / "z.stablehlo"),
                       entry="diverse_metrics", mesh_data=2)
    with pytest.raises(ValueError, match="not divisible"):
        export_serving(ckpt_dir, str(tmp_path / "w.stablehlo"),
                       entry="diverse_metrics", nsample=4, batch_size=3,
                       mesh_samples=2, mesh_data=2)


def test_load_serving_sharding_recovery_fallback(ckpt_dir, tmp_path,
                                                 monkeypatch):
    """If the artifact's input shardings cannot be recovered (jax version
    drift, conversion failure onto the runtime mesh), load_serving must
    WARN and fall back to replicated inputs — outputs stay correct, only
    the per-call transfer volume degrades."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    out = str(tmp_path / "sharded_fb.stablehlo")
    export_serving(ckpt_dir, out, entry="diverse_metrics",
                   nsample=4, batch_size=2, n_eval=12, mesh_samples=2)
    served_ok = load_serving(out)
    x = _x()
    key = jax.random.PRNGKey(13)
    want = jax.tree.map(np.asarray, served_ok(x, key))

    from jax import export as jax_export
    monkeypatch.setattr(
        jax_export.Exported, "in_shardings_jax",
        lambda self, mesh: (_ for _ in ()).throw(RuntimeError("drift")),
        raising=True)
    with pytest.warns(UserWarning, match="could not recover"):
        served_fb = load_serving(out)
    got = jax.tree.map(np.asarray, served_fb(x, key))
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6, atol=1e-7)
