"""DVG-TPU: a TPU-native (JAX/XLA/Pallas/pjit) diverse-video-generation framework.

From-scratch rebuild of the capabilities of shgaurav1/DVG ("Diverse Video
Generation using a Gaussian Process Trigger", ICLR '21): stochastic video
prediction that rolls out many diverse futures from a few context frames by
pairing a conv encoder/decoder + latent LSTM with a batched variational GP
over the latent dynamics, whose predictive variance triggers stochastic
trajectory forks.

Everything here is designed TPU-first:
  * time loops are `lax.scan`, never Python loops, inside one jitted step;
  * the 100-future diversity sweep is a single `vmap`, not a serial loop;
  * multi-chip scaling is a `jax.sharding.Mesh` + `shard_map`/`pjit`
    (data parallel over batch x samples), not a ported NCCL layer;
  * hot ops have Pallas kernel variants (see `dvg_tpu.ops`).

Reference parity citations (file:line) point at /root/reference.
"""

__version__ = "0.1.0"

import os as _os


def enable_compilation_cache(path: str = "") -> None:
    """Persistent XLA compilation cache — first compile of the big scan
    programs is minutes through a remote-compile relay; cached reruns are
    seconds. Called by the CLIs/bench; set DVG_NO_CACHE=1 to disable."""
    if _os.environ.get("DVG_NO_CACHE"):
        return
    import jax
    cache = (path or _os.environ.get("JAX_COMPILATION_CACHE_DIR")
             or _os.path.expanduser("~/.cache/dvg_tpu_xla"))
    _os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


from dvg_tpu.config import DVGConfig  # noqa: F401,E402
