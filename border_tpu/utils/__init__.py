"""Utilities: checkpointing, profiling, policy export."""

from border_tpu.utils.checkpoint import CheckpointManager  # noqa: F401
from border_tpu.utils.profiling import profile_trace  # noqa: F401
from border_tpu.utils.export import export_policy, NumpyMLPPolicy  # noqa: F401
