"""Pallas TPU kernels for the framework's hot memory ops.

Every kernel has a pure-JAX reference implementation (used on CPU and as
the correctness oracle in tests); on TPU the Pallas path is selected
automatically.
"""

from border_tpu.ops.frame_gather import gather_frames, gather_frames_ref

__all__ = ["gather_frames", "gather_frames_ref"]
