"""Test configuration: force CPU with 8 virtual devices so mesh/pjit paths
are exercised without TPU hardware (SURVEY.md §4 'multi-chip without a
cluster'). Must run before jax initializes its backends."""

import os

# Hard override: the shell exports JAX_PLATFORMS=axon (the tunneled TPU);
# tests must run on the virtual 8-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
