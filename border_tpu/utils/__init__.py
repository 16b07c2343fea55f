"""Utilities: checkpointing, profiling, policy export, config construction,
live display / frame capture."""

from border_tpu.utils.cache import enable_compilation_cache  # noqa: F401
from border_tpu.utils.checkpoint import CheckpointManager  # noqa: F401
from border_tpu.utils.window import FrameRecorder, TerminalWindow  # noqa: F401
from border_tpu.utils.profiling import profile_trace  # noqa: F401
from border_tpu.utils.export import export_policy, NumpyMLPPolicy  # noqa: F401
from border_tpu.utils.config import (  # noqa: F401
    build_agent,
    build_agent_from_path,
    build_env,
    build_env_from_path,
    config_to_dict,
    flatten_config,
    register_model,
    save_config,
)
