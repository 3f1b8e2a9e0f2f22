"""Golden fixed-seed regression (SURVEY.md §4): pins summary statistics of a
fixed-seed init + rollout + joint loss on the CPU test backend. Catches
silent numerical drift from refactors — a behavior change that matters will
move these by far more than the float-noise tolerance. Regenerate the
constants deliberately (tests/test_golden.py docstring command) when a
change is INTENDED to alter numerics."""

import jax
import jax.numpy as jnp
import numpy as np

from dvg_tpu.config import DVGConfig
from dvg_tpu.generate.rollout import make_rollout_fns
from dvg_tpu.models.dvg import DVGModel
from dvg_tpu.train import step as S

GOLDEN = {
    "post_mean": 0.25129377841949463,
    "post_std": 0.3198006749153137,
    "ssim_mean": 0.001006151083856821,
    "mse_mean": 0.3264881670475006,
    "joint_loss": 1142.9779052734375,
}


def test_fixed_seed_golden():
    cfg = DVGConfig(dataset="smmnist", channels=1, image_width=64,
                    batch_size=2, n_past=2, n_future=2, n_eval=4,
                    g_dim=8, rnn_size=16, num_inducing_points=4, nsample=2)
    model = DVGModel(cfg)
    params, stats = model.init(jax.random.PRNGKey(123))
    cache = model.gp_cache(params)
    fns = make_rollout_fns(model, cfg, nsample=2)
    x = jax.random.uniform(jax.random.PRNGKey(7), (4, 2, 64, 64, 1))
    post = fns.posterior(params, stats, cache, x)
    met = fns.diverse_metrics(params, stats, cache, x, jax.random.PRNGKey(9))
    loss, _ = S.joint_loss(params, stats, x, model, cfg)

    got = {
        "post_mean": float(jnp.mean(post)),
        "post_std": float(jnp.std(post)),
        "ssim_mean": float(jnp.mean(met["ssim"])),
        "mse_mean": float(jnp.mean(met["mse"])),
        "joint_loss": float(loss),
    }
    for k, ref in GOLDEN.items():
        np.testing.assert_allclose(got[k], ref, rtol=1e-4,
                                   err_msg=f"golden drift in {k}: {got}")
