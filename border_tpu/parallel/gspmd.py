"""GSPMD trainer: dp×tp over a 2-D mesh via sharding annotations.

The second idiomatic TPU parallelism path, complementing
:class:`border_tpu.parallel.ShardedTrainer` (explicit shard_map over an
``actors`` axis):

- **data parallelism** — env/replay batch axes sharded over ``actors``,
- **tensor parallelism** — Dense/Conv kernels sharded over ``model``
  (column-parallel: the output-feature axis is split; XLA inserts the
  all-gathers/psums GSPMD-style).

No manual collectives: states are *placed* with NamedShardings once and
the inherited fused chunk (`Trainer._chunk`, an ordinary jit) is
partitioned by XLA from its input shardings — the "pick a mesh, annotate
shardings, let XLA insert collectives" recipe.  The reference has no
model-parallel story at all (SURVEY.md §2.3: its only parallelism is actor
threads); this is where larger policies than its MLP/CNN family scale.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from border_tpu.core.agent import Agent
from border_tpu.core.env import Environment
from border_tpu.record.recorder import Recorder
from border_tpu.replay.buffer import ReplayBuffer
from border_tpu.train.config import TrainerConfig
from border_tpu.train.evaluator import Evaluator
from border_tpu.train.trainer import Trainer


def make_dp_tp_mesh(dp: int, tp: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if dp * tp != len(devices):
        raise ValueError(f"dp×tp = {dp * tp} != {len(devices)} devices")
    return Mesh(np.asarray(devices).reshape(dp, tp), ("actors", "model"))


class GSPMDTrainer(Trainer):
    """Trainer whose states carry dp×tp NamedShardings.

    Parameter rule (column-parallel): any kernel with ≥2 dims shards its
    LAST axis over ``model`` when divisible; 1-D leaves (biases, scales)
    stay replicated — they are tiny, and XLA re-shards them at the fused
    matmul+bias site anyway.
    Env state shards its leading (env) axis over ``actors``; replay
    storage stays replicated (random gathers are cheapest against a local
    copy at these sizes).
    """

    def __init__(
        self,
        env: Environment,
        agent: Agent,
        buffer: ReplayBuffer,
        config: TrainerConfig = TrainerConfig(),
        recorder: Optional[Recorder] = None,
        evaluator: Optional[Evaluator] = None,
        mesh: Optional[Mesh] = None,
    ):
        super().__init__(env, agent, buffer, config, recorder, evaluator)
        if mesh is None:
            mesh = make_dp_tp_mesh(1, jax.device_count())
        if set(mesh.axis_names) != {"actors", "model"}:
            raise ValueError("GSPMDTrainer needs a ('actors','model') mesh")
        self.mesh = mesh
        self.tp = mesh.shape["model"]
        if config.num_envs % mesh.shape["actors"]:
            raise ValueError("num_envs must divide the actors axis")

    # -- sharding assignment -------------------------------------------------
    def _param_sharding(self, leaf) -> NamedSharding:
        spec = [None] * leaf.ndim
        if leaf.shape[-1] % self.tp == 0:
            spec[-1] = "model"  # column-parallel kernels
        return NamedSharding(self.mesh, P(*spec))

    def _batch_sharding(self, leaf) -> NamedSharding:
        spec = [None] * max(leaf.ndim, 0)
        if leaf.ndim >= 1 and leaf.shape[0] == self.config.num_envs:
            spec[0] = "actors"
        return NamedSharding(self.mesh, P(*spec))

    def _replicated(self, leaf) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def init_states(self, k_agent, k_env):
        agent_state, vec_state, buffer_state = super().init_states(
            k_agent, k_env
        )
        # params (and their optimizer/target mirrors) → model-sharded;
        # everything else in the agent state replicated
        agent_state = jax.tree.map(
            lambda x: jax.device_put(
                x,
                self._param_sharding(x)
                if hasattr(x, "ndim") and x.ndim >= 2
                else self._replicated(x),
            ),
            agent_state,
        )
        vec_state = jax.tree.map(
            lambda x: jax.device_put(x, self._batch_sharding(x)), vec_state
        )
        # replay storage: leaves with a leading env axis (the frame-dedup
        # buffer's [num_envs, cap, ...] columns) shard over 'actors' — at
        # pixel scale the frame ring is the dominant HBM tenant and cannot
        # be replicated per device; flat [capacity, ...] ring leaves stay
        # replicated (random gathers are cheapest against a local copy at
        # MLP sizes)
        buffer_state = jax.tree.map(
            lambda x: jax.device_put(x, self._batch_sharding(x)),
            buffer_state,
        )
        return agent_state, vec_state, buffer_state
