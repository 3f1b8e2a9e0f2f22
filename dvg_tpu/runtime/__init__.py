"""Native runtime: C++ host-side components behind ctypes bindings.

The reference's only native surface is prebuilt torch/gpytorch CUDA kernels
plus torch DataLoader worker processes (SURVEY.md §2: zero C++/Rust/CUDA
source). Here the TPU compute path is XLA; the host runtime around it is
C++ where it pays:

  * `fastload` — threaded PNG/JPEG frame decoding straight into time-major
    float32 batches (the PNG-tree datasets' hot path).
"""

from dvg_tpu.runtime.fastload import decode_batch, is_available

__all__ = ["decode_batch", "is_available"]
