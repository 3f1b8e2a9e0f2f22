"""Lean train-step timing (bench.py's train recipe, standalone) — for
same-session A/B of two checkouts: run with PYTHONPATH pointing at the
tree under test. Prints one JSON line."""
import json
import os
import sys
import time

# NO repo-root insertion here: PYTHONPATH selects the dvg_tpu under test
import jax
import jax.numpy as jnp

import dvg_tpu
dvg_tpu.enable_compilation_cache()

from dvg_tpu.config import DVGConfig
from dvg_tpu.train.step import init_train_state, make_train_step_fn


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    float(jax.jit(lambda ls: sum(jnp.sum(l.astype(jnp.float32))
                                 for l in ls))(leaves))


def main():
    width = int(os.environ.get("BENCH_WIDTH", 64))
    batch = int(os.environ.get("BENCH_TRAIN_BATCH", 50))
    cfg = DVGConfig(dataset="bair", channels=3, image_width=width,
                    batch_size=batch, n_past=5, n_future=10, n_eval=15,
                    model=os.environ.get("BENCH_MODEL", "dcgan"),
                    dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
                    remat=(width > 64))
    model, state, opts = init_train_state(cfg, jax.random.PRNGKey(4))
    step = jax.jit(make_train_step_fn(model, cfg, opts))
    xt = jax.random.uniform(jax.random.PRNGKey(5),
                            (15, batch, width, width, 3), jnp.float32)
    t0 = time.perf_counter()
    state, _ = step(state, xt)
    _sync(state.params)
    compile_s = time.perf_counter() - t0
    reps = int(os.environ.get("BENCH_TRAIN_REPS", 10))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            state, _ = step(state, xt)
        _sync(state.params)
        best = min(best, (time.perf_counter() - t0) / reps * 1000.0)
    print(json.dumps({"train_step_ms": round(best, 2),
                      "compile_s": round(compile_s, 1),
                      "tree": os.path.dirname(os.path.dirname(
                          os.path.abspath(dvg_tpu.__file__))),
                      "device": jax.devices()[0].device_kind}))


if __name__ == "__main__":
    main()
