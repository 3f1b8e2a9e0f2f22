"""Test configuration: force CPU with 8 virtual devices so mesh/pjit paths
are exercised without TPU hardware (SURVEY.md §4 'multi-chip without a
cluster').

The environment's sitecustomize registers the axon TPU PJRT plugin at
interpreter start and sets jax.config jax_platforms="axon,cpu", which
overrides the JAX_PLATFORMS env var — so the env var alone is not enough;
we must rewrite the config value after importing jax (backends are not
initialized until first use, so this is still early enough)."""

import contextlib
import os
import sys

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

REFERENCE = "/root/reference"


@contextlib.contextmanager
def reference_modules():
    """Import the VERBATIM reference model modules off /root/reference,
    isolated from any installed 'models' package and with the hardcoded
    .cuda() calls neutralized (lstm.py:24-25) — shared by the
    test_reference_source_parity and test_trained_model_parity `ref`
    fixtures so the save/restore recipe exists once."""
    import importlib
    from types import SimpleNamespace

    import torch

    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    saved = {k: sys.modules[k] for k in list(sys.modules)
             if k == "models" or k.startswith("models.")}
    for k in saved:
        del sys.modules[k]
    sys.path.insert(0, REFERENCE)
    try:
        dcgan_64 = importlib.import_module("models.dcgan_64")
        vgg_64 = importlib.import_module("models.vgg_64")
        lstm_mod = importlib.import_module("models.lstm")
        for m in (dcgan_64, vgg_64, lstm_mod):
            assert m.__file__.startswith(REFERENCE), m.__file__
        yield SimpleNamespace(dcgan=dcgan_64, vgg=vgg_64, lstm=lstm_mod)
    finally:
        sys.path.remove(REFERENCE)
        for k in [k for k in list(sys.modules)
                  if k == "models" or k.startswith("models.")]:
            del sys.modules[k]
        sys.modules.update(saved)
        torch.Tensor.cuda = orig_cuda
