"""HBM-resident replay buffers.

TPU-native analogue of border-core's generic_replay_buffer
(SimpleReplayBuffer: border-core/src/generic_replay_buffer/base.rs:86-427,
sum-tree PER: base/sum_tree.rs:21-174).
"""

from border_tpu.replay.buffer import (  # noqa: F401
    PerConfig,
    ReplayBuffer,
    ReplayBufferState,
    Transition,
    TransitionBatch,
)
from border_tpu.replay.sum_tree import SumTree, SumTreeState  # noqa: F401
from border_tpu.replay.frame_buffer import (  # noqa: F401
    FrameReplayBuffer,
    FrameReplayState,
)
