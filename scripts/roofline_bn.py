"""Roofline arithmetic for the train step's BN floor (PERF.md r4).

VERDICT r3 #6 asked for numbers, not an argument: either train_step_ms
<= 60 or show the ~14 ms train-mode-BN residue is HBM-bandwidth-inherent.
Run on the real chip (needs the axon PYTHONPATH *appended*, see
axon-env-gotchas):

  1. achieved HBM bandwidth from a saxpy chain at a 2 GiB working set
     (small arrays time dispatch, not the chip — see the 64 MiB row of the
     sweep in PERF.md; every timing fetches a scalar because the tunnel's
     block_until_ready acks before completion);
  2. the train step's exact BN inventory, derived from the step structure
     (train/step.py): joint pass encodes T frames fwd+bwd and decodes
     V*(T-1) grouped calls fwd+bwd; the shared finetune encode is
     stop-gradiented -> forward-only (finetune_encode);
  3. the analytic minimum bytes (fwd: stats-read + normalize-read + write
     = 3 passes; bwd: dy read for the two reduces and the dx pass, x-hat
     read, dx write = 4 passes) at the measured bandwidth;
  4. a BN-only fwd+bwd microbenchmark at that exact inventory
     (vmapped per-call stats, like the step) to check XLA's BN against
     the bound.

Prints one JSON dict; the r4 numbers live in PERF.md.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import dvg_tpu.models.layers as L

T, B, V = 15, 50, 3
ENC_MAPS = [(32, 32, 64), (16, 16, 128), (8, 8, 256), (4, 4, 512), (1, 1, 90)]
DEC_MAPS = [(4, 4, 512), (8, 8, 256), (16, 16, 128), (32, 32, 64)]


def _fetch(out):
    # the shared tunnel-proof completion fence
    from dvg_tpu.utils.profiling import sync_fence

    sync_fence(out)
    return out


def measure_hbm_bw(gib=2, reps=100):
    n = gib * 1024 * 1024 * 1024 // 2
    x = jnp.full((n,), 1.5, jnp.bfloat16)
    f = jax.jit(lambda x: x * jnp.bfloat16(0.9999) + jnp.bfloat16(0.001))
    y = f(x)
    _fetch(y)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = f(y)
    _fetch(y)
    dt = (time.perf_counter() - t0) / reps
    return 2 * n * 2 / dt / 1e9


def bn_min_bytes():
    e1 = B * sum(h * w * c for h, w, c in ENC_MAPS)     # one frame, elems
    d1 = B * sum(h * w * c for h, w, c in DEC_MAPS)     # one call, elems
    passes = (T * e1 * (3 + 4)            # joint encoder fwd+bwd
              + V * (T - 1) * d1 * (3 + 4)   # joint decoder fwd+bwd
              + T * e1 * 3)               # finetune encode, forward-only
    return passes * 2                     # bf16


def bn_microbench(reps=10):
    def mk(lead, maps, seed):
        ks = jax.random.split(jax.random.PRNGKey(seed), len(maps))
        return [jax.random.normal(k, (lead, B) + s, jnp.bfloat16)
                for k, s in zip(ks, maps)]

    xe, xd, xf = mk(T, ENC_MAPS, 0), mk(V * (T - 1), DEC_MAPS, 1), \
        mk(T, ENC_MAPS, 2)

    def bn(x):
        p = {"scale": jnp.ones((x.shape[-1],)),
             "bias": jnp.zeros((x.shape[-1],))}
        s = {"mean": jnp.zeros((x.shape[-1],)),
             "var": jnp.ones((x.shape[-1],))}
        y, _ = jax.vmap(lambda xt: L.batchnorm_apply(p, s, xt, train=True))(x)
        return y

    def loss(t):
        xe, xd = t
        return (sum(jnp.sum(bn(x).astype(jnp.float32) ** 2) for x in xe)
                + sum(jnp.sum(bn(x).astype(jnp.float32) ** 2) for x in xd))

    g = jax.jit(lambda xe, xd, xf: (jax.grad(loss)((xe, xd)),
                                    [bn(x) for x in xf]))
    o = g(xe, xd, xf)
    _fetch(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = g(xe, xd, xf)
    _fetch(o)
    return (time.perf_counter() - t0) / reps * 1000.0


def main():
    bw = measure_hbm_bw()
    nbytes = bn_min_bytes()
    micro_ms = bn_microbench()
    pred_ms = nbytes / (bw * 1e9) * 1000.0
    print(json.dumps({
        "hbm_bw_GBs": round(bw, 1),
        "bn_min_GB_per_step": round(nbytes / 1e9, 3),
        "bn_roofline_ms": round(pred_ms, 2),
        "bn_microbench_fwdbwd_ms": round(micro_ms, 2),
        "bn_efficiency_vs_saxpy": round(pred_ms / micro_ms, 3),
    }, indent=1))


if __name__ == "__main__":
    main()
