"""Golden fixed-seed regression (SURVEY.md §4): pins summary statistics of a
fixed-seed init + rollout + joint loss on the CPU test backend, across every
backbone/dtype/kernel variant a refactor could silently break: dcgan-64 f32
(the flagship), vgg-64, dcgan-128 (the 5-stage + sigmoid-quirk path), bf16
mixed precision, and the Pallas SSIM kernel path.

A behavior change that matters moves these far beyond float noise.
Regenerate constants deliberately when a change is INTENDED to alter
numerics:  python tests/test_golden.py   (prints the GOLDEN dict).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvg_tpu.config import DVGConfig
from dvg_tpu.generate.rollout import make_rollout_fns
from dvg_tpu.models.dvg import DVGModel
from dvg_tpu.train import step as S

BASE = dict(dataset="smmnist", batch_size=2, n_past=2, n_future=2, n_eval=4,
            g_dim=8, rnn_size=16, num_inducing_points=4, nsample=2)

VARIANTS = {
    "dcgan64_f32": dict(channels=1, image_width=64),
    "vgg64_f32": dict(channels=1, image_width=64, model="vgg"),
    "dcgan128_f32": dict(channels=3, image_width=128),
    "dcgan64_bf16": dict(channels=1, image_width=64, dtype="bfloat16"),
    "dcgan64_pallas": dict(channels=1, image_width=64, use_pallas=True),
}

GOLDEN = {
    "dcgan64_f32": {
        "post_mean": 0.25129377841949463,
        "post_std": 0.3198006749153137,
        "ssim_mean": 0.001006151083856821,
        "mse_mean": 0.3264881670475006,
        "joint_loss": 1142.9779052734375,
    },
    "vgg64_f32": {
        "post_mean": 0.4986443519592285,
        "post_std": 0.2042931765317917,
        "ssim_mean": 0.041804179549217224,
        "mse_mean": 0.08332079648971558,
        "joint_loss": 272.15509033203125,
    },
    "dcgan128_f32": {
        "post_mean": 0.5000544786453247,
        "post_std": 0.20419448614120483,
        "ssim_mean": 0.041849441826343536,
        "mse_mean": 0.08367547392845154,
        "joint_loss": 270.02447509765625,
    },
    "dcgan64_bf16": {
        "post_mean": 0.25128859281539917,
        "post_std": 0.3198099732398987,
        "ssim_mean": 0.001003192039206624,
        "mse_mean": 0.32650458812713623,
        "joint_loss": 1143.7469482421875,
    },
    "dcgan64_pallas": {
        "post_mean": 0.25129377841949463,
        "post_std": 0.31980064511299133,
        "ssim_mean": 0.0010061509674414992,
        "mse_mean": 0.3264881670475006,
        "joint_loss": 1142.9779052734375,
    },
}


def _compute(name):
    cfg = DVGConfig(**BASE, **VARIANTS[name])
    model = DVGModel(cfg)
    params, stats = model.init(jax.random.PRNGKey(123))
    cache = model.gp_cache(params)
    fns = make_rollout_fns(model, cfg, nsample=2)
    x = jax.random.uniform(
        jax.random.PRNGKey(7),
        (4, 2, cfg.image_width, cfg.image_width, cfg.channels))
    post = fns.posterior(params, stats, cache, x)
    met = fns.diverse_metrics(params, stats, cache, x, jax.random.PRNGKey(9))
    loss, _ = S.joint_loss(params, stats, x, model, cfg)
    return {
        "post_mean": float(jnp.mean(post)),
        "post_std": float(jnp.std(post)),
        "ssim_mean": float(jnp.mean(met["ssim"])),
        "mse_mean": float(jnp.mean(met["mse"])),
        "joint_loss": float(loss),
    }


@pytest.mark.parametrize("name", list(VARIANTS))
def test_fixed_seed_golden(name):
    ref = GOLDEN[name]
    assert ref is not None, f"GOLDEN[{name!r}] not generated yet"
    got = _compute(name)
    # bf16 compute reorders across XLA releases more than f32 does
    rtol = 2e-3 if "bf16" in name else 1e-4
    for k, v in ref.items():
        np.testing.assert_allclose(got[k], v, rtol=rtol,
                                   err_msg=f"golden drift in {name}.{k}: {got}")


if __name__ == "__main__":
    import json
    print(json.dumps({n: _compute(n) for n in VARIANTS}, indent=2))
