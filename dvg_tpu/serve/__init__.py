"""Serving/export layer: AOT StableHLO artifacts of the rollout entry
points (see dvg_tpu.serve.export)."""

from dvg_tpu.serve.export import export_serving, load_serving

__all__ = ["export_serving", "load_serving"]
