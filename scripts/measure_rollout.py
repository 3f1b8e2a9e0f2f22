"""Quick headline-rollout measurement (the bench.py diverse_metrics phase
only) — for profiling-loop iteration without the full bench run."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import dvg_tpu
dvg_tpu.enable_compilation_cache()

from dvg_tpu.config import DVGConfig
from dvg_tpu.generate.rollout import make_rollout_fns
from dvg_tpu.models.dvg import DVGModel


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    combined = jax.jit(lambda ls: sum(jnp.sum(l.astype(jnp.float32))
                                      for l in ls))(leaves)
    float(combined)


def main():
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    model_name = os.environ.get("BENCH_MODEL", "dcgan")
    width = int(os.environ.get("BENCH_WIDTH", 64))
    nsample = int(os.environ.get("BENCH_SAMPLES", 100))
    batch = int(os.environ.get("BENCH_BATCH", 50))
    n_eval = int(os.environ.get("BENCH_NEVAL", 105))
    n_past = 5
    cfg = DVGConfig(dataset="bair", channels=3, image_width=width,
                    batch_size=batch, n_past=n_past,
                    n_future=n_eval - n_past, n_eval=n_eval,
                    model=model_name, nsample=nsample, dtype=dtype,
                    use_pallas=os.environ.get("BENCH_PALLAS", "1") == "1")
    model = DVGModel(cfg)
    params, stats = model.init(jax.random.PRNGKey(0))
    cache = model.gp_cache(params)
    fns = make_rollout_fns(model, cfg, nsample=nsample)
    x = jax.device_put(jax.random.uniform(
        jax.random.PRNGKey(1), (n_eval, batch, width, width, 3), jnp.float32))

    metrics_fn = jax.jit(fns.diverse_metrics)
    t0 = time.perf_counter()
    out = metrics_fn(params, stats, cache, x, jax.random.PRNGKey(2))
    _sync(out)
    compile_s = time.perf_counter() - t0

    dt = float("inf")
    for r in range(int(os.environ.get("BENCH_REPS", 3))):
        t0 = time.perf_counter()
        out = metrics_fn(params, stats, cache, x, jax.random.PRNGKey(3 + r))
        _sync(out)
        dt = min(dt, time.perf_counter() - t0)
    frames = nsample * (n_eval - n_past) * batch
    print(json.dumps({"rollout_s": round(dt, 4),
                      "fps": round(frames / dt, 1),
                      "ms_per_step": round(dt / (n_eval - n_past) * 1e3, 3),
                      "compile_s": round(compile_s, 1),
                      "device": jax.devices()[0].device_kind}))


if __name__ == "__main__":
    main()
