"""Advantage-Weighted Actor-Critic (offline / off-policy).

≙ border-candle-agent Awac (awac/base.rs:28-335):
- critic: standard TD with min-Q target over the ensemble
  (update_critic :66-126),
- actor loss ``−logπ(a|s)·w`` with ``w = exp(adv/λ)`` clamped to
  ``exp_adv_max``, or ``softmax(adv/λ)`` over the batch
  (update_actor :127-169, weight :142-146).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from border_tpu.agents import gaussian
from border_tpu.agents.common import bootstrap_discount, make_optimizer, maybe_pmean, polyak_update
from border_tpu.core.agent import Agent
from border_tpu.core import spaces
from border_tpu.models.mlp import MLP, GaussianHeadMLP
from border_tpu.replay.buffer import TransitionBatch


@dataclasses.dataclass(frozen=True)
class AWACConfig:
    gamma: float = 0.99
    tau: float = 0.005
    n_critics: int = 2
    lambda_: float = 1.0  # advantage temperature
    exp_adv_max: float = 100.0
    weight_mode: str = "exp"  # "exp" | "softmax"
    action_limit: str = "clamp"
    actor_lr: float = 3e-4
    critic_lr: float = 3e-4
    optimizer: str = "adam"
    actor_hidden: Sequence[int] = (256, 256)
    critic_hidden: Sequence[int] = (256, 256)


@struct.dataclass
class AWACState:
    actor_params: Any
    critic_params: Any
    critic_target_params: Any
    actor_opt: Any
    critic_opt: Any
    n_opts: jax.Array
    n_samples: jax.Array


class AWAC(Agent):
    name = "awac"
    _model_attrs = ("actor", "critic")

    def __init__(self, config: AWACConfig = AWACConfig()):
        self.config = config
        self.actor_tx = make_optimizer(config.optimizer, config.actor_lr)
        self.critic_tx = make_optimizer(config.optimizer, config.critic_lr)

    def init(self, key: jax.Array, obs_space: spaces.Box, act_space: spaces.Box) -> AWACState:
        c = self.config
        self.act_dim = int(act_space.flat_dim)
        self.act_low = float(jnp.min(jnp.asarray(act_space.low)))
        self.act_high = float(jnp.max(jnp.asarray(act_space.high)))
        self._bind_models(
            actor=GaussianHeadMLP(act_dim=self.act_dim,
                                  hidden=tuple(c.actor_hidden)),
            critic=MLP(out_dim=1, hidden=tuple(c.critic_hidden)),
        )
        k_a, k_c = jax.random.split(key)
        dummy_obs = obs_space.zero()[None]
        dummy_act = act_space.zero().reshape(1, -1)
        actor_params = self.actor.init(k_a, dummy_obs)
        critic_in = jnp.concatenate([dummy_obs, dummy_act], axis=-1)
        critic_params = jax.vmap(lambda k: self.critic.init(k, critic_in))(
            jax.random.split(k_c, c.n_critics)
        )
        return AWACState(
            actor_params=actor_params,
            critic_params=critic_params,
            critic_target_params=jax.tree.map(jnp.copy, critic_params),
            actor_opt=self.actor_tx.init(actor_params),
            critic_opt=self.critic_tx.init(critic_params),
            n_opts=jnp.int32(0),
            n_samples=jnp.int32(0),
        )

    def _q(self, critic_params, obs, act) -> jax.Array:
        x = jnp.concatenate([obs, act.reshape(act.shape[0], -1)], axis=-1)
        return jax.vmap(lambda p: self.critic.apply(p, x)[:, 0])(critic_params)

    def _policy_sample(self, actor_params, obs, key):
        mean, log_std = self.actor.apply(actor_params, obs)
        return gaussian.sample(
            key, mean, log_std, self.config.action_limit, self.act_low, self.act_high
        )

    def select_action(self, state: AWACState, obs: jax.Array, key: jax.Array) -> jax.Array:
        a, _ = self._policy_sample(state.actor_params, obs, key)
        return a

    def select_action_eval(self, state: AWACState, obs: jax.Array, key: jax.Array) -> jax.Array:
        mean, _ = self.actor.apply(state.actor_params, obs)
        if self.config.action_limit == "tanh":
            return jnp.tanh(mean)
        return jnp.clip(mean, self.act_low, self.act_high)

    def on_env_step(self, state: AWACState, n: int) -> AWACState:
        return state.replace(n_samples=state.n_samples + n)

    def update(
        self, state: AWACState, batch: TransitionBatch, key: jax.Array = None
    ) -> Tuple[AWACState, Dict[str, jax.Array], jax.Array]:
        c = self.config
        obs, act, next_obs, reward, terminated, _t, _i, weight = batch.unpack()
        act2d = act.reshape(act.shape[0], -1)
        reward = reward.astype(jnp.float32)
        k_next, k_pi = jax.random.split(key)

        # --- critic (update_critic, awac/base.rs:66-126)
        next_act, _ = self._policy_sample(state.actor_params, next_obs, k_next)
        q_next = jnp.min(self._q(state.critic_target_params, next_obs, next_act), axis=0)
        target = jax.lax.stop_gradient(
            reward + bootstrap_discount(c.gamma, batch) * q_next
        )

        def critic_loss(critic_params):
            q = self._q(critic_params, obs, act2d)
            return jnp.mean(weight[None, :] * (q - target[None, :]) ** 2)

        c_loss, c_grads = jax.value_and_grad(critic_loss)(state.critic_params)
        c_grads = maybe_pmean(c_grads, self.axis_name)
        c_up, critic_opt = self.critic_tx.update(c_grads, state.critic_opt, state.critic_params)
        critic_params = optax.apply_updates(state.critic_params, c_up)

        # --- advantage weights (awac/base.rs:142-146)
        a_pi, _ = self._policy_sample(state.actor_params, obs, k_pi)
        v = jnp.min(self._q(critic_params, obs, a_pi), axis=0)
        q_data = jnp.min(self._q(critic_params, obs, act2d), axis=0)
        adv = q_data - v
        if c.weight_mode == "softmax":
            w = jax.nn.softmax(adv / c.lambda_) * adv.shape[0]
        else:
            w = jnp.minimum(jnp.exp(adv / c.lambda_), c.exp_adv_max)
        w = jax.lax.stop_gradient(w)

        # --- actor −logπ(a|s)·w (awac/base.rs:127-169)
        def actor_loss(actor_params):
            mean, log_std = self.actor.apply(actor_params, obs)
            logp = gaussian.logp_of(act2d, mean, log_std, c.action_limit)
            return -jnp.mean(w * logp)

        a_loss, a_grads = jax.value_and_grad(actor_loss)(state.actor_params)
        a_grads = maybe_pmean(a_grads, self.axis_name)
        a_up, actor_opt = self.actor_tx.update(a_grads, state.actor_opt, state.actor_params)
        actor_params = optax.apply_updates(state.actor_params, a_up)

        critic_target_params = polyak_update(c.tau, critic_params, state.critic_target_params)
        td_err = q_data - target
        metrics = {
            "loss_critic": c_loss,
            "loss_actor": a_loss,
            "adv_mean": jnp.mean(adv),
            "w_mean": jnp.mean(w),
        }
        return (
            AWACState(
                actor_params, critic_params, critic_target_params,
                actor_opt, critic_opt, state.n_opts + 1, state.n_samples,
            ),
            metrics,
            td_err,
        )

    def policy_params(self, state: AWACState) -> Any:
        return state.actor_params

    def sync_policy(self, state: AWACState, policy_params: Any) -> AWACState:
        return state.replace(actor_params=policy_params)
