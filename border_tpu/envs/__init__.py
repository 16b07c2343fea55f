"""Pure-JAX environments.

TPU-native replacement for the reference's env crates:

- classic control (CartPole/Pendulum/MountainCar/Acrobot) replaces
  border-py-gym-env's embedded-CPython Gymnasium bridge
  (border-py-gym-env/src/base.rs:201-474) with on-device dynamics —
  Gymnasium-faithful physics so learning curves are comparable.
- pixel games (:mod:`border_tpu.envs.pong`) replace border-atari-env's
  C++ ALE FFI (border-atari-env/src/atari_env/ale.rs:62-100) with an
  on-device stepper + the DQN-paper preprocessing pipeline
  (:mod:`border_tpu.envs.preprocess`).
"""

from border_tpu.envs.classic_control import (  # noqa: F401
    Acrobot,
    CartPole,
    MountainCar,
    MountainCarContinuous,
    Pendulum,
)
from border_tpu.envs.py_env import PyVecEnv  # noqa: F401
from border_tpu.envs.registry import make, register, registry  # noqa: F401

# real-ALE seam: exported lazily-guarded (ale-py is optional)
from border_tpu.envs.ale import AleVecEnv, ale_available  # noqa: F401
