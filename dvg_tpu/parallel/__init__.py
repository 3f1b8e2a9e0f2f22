"""Parallelism layer: device meshes, shardings, multi-chip train/generate.

The reference has NO distributed backend of any kind (SURVEY.md §2
parallelism statement: single process, single GPU, serial sample loop).
This layer is therefore new capability, built the TPU way: a
`jax.sharding.Mesh` over ICI with named axes, sharding annotations on the
batch ('data') and diversity-sample ('sample') axes, and XLA-inserted
collectives (psum for gradients, all-gathers for eval) — no hand-written
NCCL/MPI equivalent.
"""

from dvg_tpu.parallel.mesh import (make_mesh, shard_batch, replicate,
                                   shard_train_step, shard_diverse_rollout,
                                   distributed_init, is_coordinator,
                                   replicate_to_mesh)

__all__ = ["make_mesh", "shard_batch", "replicate", "shard_train_step",
           "shard_diverse_rollout", "distributed_init", "is_coordinator",
           "replicate_to_mesh"]
