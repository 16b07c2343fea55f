"""Core contracts: spaces, functional environments, agent interfaces.

TPU-native analogue of ``border-core/src/base`` (Env/Obs/Act/Policy/Agent/
Step/StepProcessor traits, border-core/src/base/env.rs:45-181 etc.).
"""

from border_tpu.core import spaces  # noqa: F401
from border_tpu.core.env import (  # noqa: F401
    Environment,
    EnvParams,
    EnvState,
    Timestep,
    VecEnv,
)
from border_tpu.core.agent import Agent, AgentState  # noqa: F401
