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

from dvg_tpu.config import DVGConfig  # noqa: F401
