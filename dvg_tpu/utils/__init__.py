"""Host-side utilities: visualization, structured logging, profiling."""

from dvg_tpu.utils.viz import (image_grid, save_image, save_gif,
                               save_gif_with_text, add_border)
from dvg_tpu.utils.logging import MetricLogger
from dvg_tpu.utils.profiling import StepTimer, trace_context

__all__ = ["image_grid", "save_image", "save_gif", "save_gif_with_text",
           "add_border", "MetricLogger", "StepTimer", "trace_context"]
