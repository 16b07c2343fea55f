"""border_tpu — a TPU-native actor-learner reinforcement-learning framework.

A ground-up JAX/XLA re-design of the capability set of ``laboroai/border``
(reference: border-core, border-async-trainer, border-{tch,candle}-agent,
border-{py-gym,atari}-env, border-minari, border-{tensorboard,mlflow-tracking},
border-policy-no-backend).  Where the reference composes Rust traits around a
single env instance and CPU↔GPU channels, border_tpu composes *pure functions
over pytrees* around thousands of vectorized env instances resident in HBM:

- :mod:`border_tpu.core`    — functional Env/Agent/space contracts
  (≙ border-core/src/base/*).
- :mod:`border_tpu.envs`    — pure-JAX environments (classic control, pixel
  games) stepped under ``vmap`` (≙ border-py-gym-env / border-atari-env).
- :mod:`border_tpu.replay`  — HBM-resident ring replay buffer with uniform and
  prioritized sampling (≙ border-core generic_replay_buffer).
- :mod:`border_tpu.agents`  — DQN, IQN, SAC, AWAC, IQL, BC as fused jitted
  update steps (≙ border-tch-agent / border-candle-agent).
- :mod:`border_tpu.train`   — synchronous Trainer and sharded actor-learner
  (≙ border-core Trainer / border-async-trainer).
- :mod:`border_tpu.record`  — Record/Recorder observability
  (≙ border-core record, border-tensorboard, border-mlflow-tracking).
- :mod:`border_tpu.parallel`— mesh/sharding utilities for multi-host scale-out.
"""

__version__ = "0.1.0"

from border_tpu.core import spaces  # noqa: F401
from border_tpu.core.env import Environment, EnvParams  # noqa: F401
from border_tpu.errors import (  # noqa: F401
    BorderTpuError,
    ConfigError,
    RecordKeyError,
    RecordValueTypeError,
)
