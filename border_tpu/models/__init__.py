"""Neural network models.

TPU-native analogue of the reference model zoo: Mlp/Mlp2
(border-tch-agent/src/mlp/base.rs, mlp/mlp2.rs), AtariCnn
(border-tch-agent/src/cnn/base.rs:23-99), and the IQN cosine-embedding model
(border-tch-agent/src/iqn/model/base.rs:23-239) — rebuilt as flax modules
with bf16-capable compute dtype so matmuls land on the MXU.
"""

from border_tpu.models.mlp import MLP, GaussianHeadMLP  # noqa: F401
from border_tpu.models.cnn import AtariCNN  # noqa: F401
from border_tpu.models.iqn import IQNNet  # noqa: F401
