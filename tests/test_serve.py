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
