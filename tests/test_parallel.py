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


def test_make_mesh():
    m = make_mesh([("data", 8)])
    assert m.shape == {"data": 8}
    m2 = make_mesh([("sample", 2), ("data", -1)])
    assert m2.shape == {"sample": 2, "data": 4}
    with pytest.raises(ValueError):
        make_mesh([("data", 99)])


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
