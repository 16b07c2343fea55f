"""Behavior cloning.

≙ border-candle-agent Bc (bc/base.rs:33-198, bc/model.rs:24-239):
continuous mode regresses actions with MSE; discrete mode trains logits
(the reference samples by argmax of the model output, bc/base.rs:49-59 —
we use cross-entropy for the discrete objective, the standard classification
form of the same argmax policy).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from border_tpu.agents.common import make_optimizer, maybe_pmean
from border_tpu.core.agent import Agent
from border_tpu.core import spaces
from border_tpu.models.mlp import MLP
from border_tpu.replay.buffer import TransitionBatch


@dataclasses.dataclass(frozen=True)
class BCConfig:
    action_mode: str = "continuous"  # "continuous" | "discrete"
    optimizer: str = "adam"
    lr: float = 3e-4
    hidden: Sequence[int] = (256, 256)


@struct.dataclass
class BCState:
    params: Any
    opt_state: Any
    n_opts: jax.Array
    n_samples: jax.Array


class BC(Agent):
    name = "bc"
    _model_attrs = ("net",)

    def __init__(self, config: BCConfig = BCConfig()):
        self.config = config
        self.tx = make_optimizer(config.optimizer, config.lr)

    def init(self, key: jax.Array, obs_space: spaces.Space, act_space: spaces.Space) -> BCState:
        c = self.config
        if c.action_mode == "discrete":
            out_dim = act_space.n
        else:
            out_dim = int(act_space.flat_dim)
            self.act_shape = act_space.shape
        self._bind_models(net=MLP(out_dim=out_dim, hidden=tuple(c.hidden)))
        params = self.net.init(key, obs_space.zero()[None])
        return BCState(
            params=params,
            opt_state=self.tx.init(params),
            n_opts=jnp.int32(0),
            n_samples=jnp.int32(0),
        )

    def select_action(self, state: BCState, obs: jax.Array, key: jax.Array) -> jax.Array:
        out = self.net.apply(state.params, obs)
        if self.config.action_mode == "discrete":
            return jnp.argmax(out, axis=-1).astype(jnp.int32)
        return out.reshape((obs.shape[0],) + self.act_shape)

    def on_env_step(self, state: BCState, n: int) -> BCState:
        return state.replace(n_samples=state.n_samples + n)

    def update(
        self, state: BCState, batch: TransitionBatch, key: jax.Array = None
    ) -> Tuple[BCState, Dict[str, jax.Array], None]:
        obs, act = batch.obs, batch.act

        def loss(params):
            out = self.net.apply(params, obs)
            if self.config.action_mode == "discrete":
                logp = jax.nn.log_softmax(out, axis=-1)
                return -jnp.mean(
                    jnp.take_along_axis(
                        logp, act.astype(jnp.int32)[:, None], axis=-1
                    )
                )
            return jnp.mean((out - act.reshape(act.shape[0], -1)) ** 2)

        loss_val, grads = jax.value_and_grad(loss)(state.params)
        grads = maybe_pmean(grads, self.axis_name)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            BCState(params, opt_state, state.n_opts + 1, state.n_samples),
            {"loss": loss_val},
            None,
        )

    def policy_params(self, state: BCState) -> Any:
        return state.params

    def sync_policy(self, state: BCState, policy_params: Any) -> BCState:
        return state.replace(params=policy_params)
