"""Isolated decoder microbench: fused (concat) eval decode vs hoisted
(skip-pre) decode inside a scan at the headline merged batch."""
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
from dvg_tpu.models.dvg import DVGModel


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    float(jax.jit(lambda ls: sum(jnp.sum(l.astype(jnp.float32))
                                 for l in ls))(leaves))


def timeit(fn, *a, reps=3):
    out = fn(*a)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*a)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    s_n, b, steps = 100, 50, 100
    width = 64
    cfg = DVGConfig(dataset="bair", channels=3, image_width=width,
                    batch_size=b, model="dcgan", dtype="bfloat16")
    model = DVGModel(cfg)
    params, stats = model.init(jax.random.PRNGKey(0))
    fold = model.fold_inference_params(params, stats)
    cast = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, t)
    fparams = cast(fold)

    sb = s_n * b
    x0 = jnp.zeros((b, width, width, 3), jnp.bfloat16)
    (h0, skip_b), _ = model.encode(fparams, stats, x0, train=False)
    g = h0.shape[-1]

    lat = jax.random.normal(jax.random.PRNGKey(1), (steps, sb, g),
                            jnp.bfloat16)

    # fused: tiled skips, concat decode (the pre-hoist hot path)
    skip_t = [jnp.tile(s, (s_n, 1, 1, 1)) for s in skip_b]

    @jax.jit
    def run_fused(lat, skip_t):
        skip_t = jax.lax.optimization_barrier(skip_t)

        def step(c, l):
            y, _ = model.decode(fparams, stats, l, skip_t, train=False)
            return c, jnp.sum(y.astype(jnp.float32))
        return jax.lax.scan(step, 0, lat)[1]

    @jax.jit
    def run_hoisted(lat, skip_b):
        pre = jax.lax.optimization_barrier(
            model.decode_skip_pre(fparams, skip_b))

        def step(c, l):
            y = model.decode_hoisted(fparams, l, pre)
            return c, jnp.sum(y.astype(jnp.float32))
        return jax.lax.scan(step, 0, lat)[1]

    # hoisted variant with the pre already tiled to S·B (isolate the
    # broadcast_add reshape from the split itself)
    pre_b = model.decode_skip_pre(fparams, skip_b)
    pre_t = [jnp.tile(p, (s_n, 1, 1, 1)) for p in pre_b]

    @jax.jit
    def run_hoisted_tiled(lat, pre_t):
        pre_t = jax.lax.optimization_barrier(pre_t)

        def step(c, l):
            y = model.decode_hoisted(fparams, l, pre_t)
            return c, jnp.sum(y.astype(jnp.float32))
        return jax.lax.scan(step, 0, lat)[1]

    res = {}
    res["fused_ms_step"] = timeit(run_fused, lat, skip_t) / steps * 1e3
    res["hoisted_ms_step"] = timeit(run_hoisted, lat, skip_b) / steps * 1e3
    res["hoisted_tiled_ms_step"] = (
        timeit(run_hoisted_tiled, lat, pre_t) / steps * 1e3)
    print(json.dumps({k: round(v, 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()
