"""Test configuration: force CPU with 8 virtual devices so mesh/pjit paths
are exercised without TPU hardware (SURVEY.md §4 'multi-chip without a
cluster').

The environment's sitecustomize registers the axon TPU PJRT plugin at
interpreter start and sets jax.config jax_platforms="axon,cpu", which
overrides the JAX_PLATFORMS env var — so the env var alone is not enough;
we must rewrite the config value after importing jax (backends are not
initialized until first use, so this is still early enough)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the conv-heavy train/rollout graphs dominate the
# suite's runtime on first compile; cached reruns cut minutes
import dvg_tpu  # noqa: E402

dvg_tpu.enable_compilation_cache()
