"""RL agents as fused jitted update steps.

TPU-native analogue of border-tch-agent (DQN/IQN/SAC,
border-tch-agent/src/{dqn,iqn,sac}) and border-candle-agent's offline
algorithms (AWAC/IQL/BC, border-candle-agent/src/{awac,iql,bc}).
"""

from border_tpu.agents.dqn import DQN, DQNConfig, DQNState  # noqa: F401
from border_tpu.agents.sac import SAC, SACConfig, SACState  # noqa: F401
from border_tpu.agents.iqn import IQN, IQNConfig, IQNState  # noqa: F401
from border_tpu.agents.bc import BC, BCConfig, BCState  # noqa: F401
from border_tpu.agents.awac import AWAC, AWACConfig, AWACState  # noqa: F401
from border_tpu.agents.iql import IQL, IQLConfig, IQLState  # noqa: F401
