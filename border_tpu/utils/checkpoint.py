"""Full-training-state checkpointing.

The reference checkpoints model params only — optimizer state, replay
buffer, RNG and counters are lost and resume means re-warmup
(SURVEY.md §5.4; Agent::save_params dqn/base.rs:348-356, routing
record/recorder.rs:81-107).  This is the designed-in superset: one orbax
checkpoint holds the agent state (params + target params + optimizer
state + counters), the replay buffer, the vectorized env state, loop
counters, and the RNG key — resume is bit-exact.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper with a stable state-dict layout."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(
        self,
        step: int,
        agent_state: Any,
        buffer_state: Any = None,
        vec_state: Any = None,
        key: Optional[jax.Array] = None,
        extra: Optional[dict] = None,
    ) -> None:
        state = {
            "agent_state": agent_state,
            "buffer_state": buffer_state,
            "vec_state": vec_state,
            "key": key,
            "extra": extra or {},
        }
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self,
        agent_state: Any,
        buffer_state: Any = None,
        vec_state: Any = None,
        key: Optional[jax.Array] = None,
        extra: Optional[dict] = None,
        step: Optional[int] = None,
    ):
        """Restore into template pytrees (shapes/dtypes must match)."""
        template = {
            "agent_state": agent_state,
            "buffer_state": buffer_state,
            "vec_state": vec_state,
            "key": key,
            "extra": extra or {},
        }
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def close(self):
        self._mgr.close()
