"""Implicit Q-Learning (offline).

≙ border-candle-agent Iql (iql/base.rs:24-318, value net iql/value.rs:1-154):
- expectile value function: asymmetric-L2 on ``minQ_tgt(s,a) − V(s)``
  (iql/base.rs:75-86),
- critic target ``r + γ(1−d)·V(s')`` (:88-121),
- AWR-style actor with ``exp(adv/λ)`` clamped (:123-155).
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
class IQLConfig:
    gamma: float = 0.99
    tau: float = 0.005
    n_critics: int = 2
    expectile: float = 0.7
    lambda_: float = 0.3333  # inverse of AWR β
    exp_adv_max: float = 100.0
    action_limit: str = "clamp"
    actor_lr: float = 3e-4
    critic_lr: float = 3e-4
    value_lr: float = 3e-4
    optimizer: str = "adam"
    actor_hidden: Sequence[int] = (256, 256)
    critic_hidden: Sequence[int] = (256, 256)
    value_hidden: Sequence[int] = (256, 256)


@struct.dataclass
class IQLState:
    actor_params: Any
    critic_params: Any
    critic_target_params: Any
    value_params: Any
    actor_opt: Any
    critic_opt: Any
    value_opt: Any
    n_opts: jax.Array
    n_samples: jax.Array


class IQL(Agent):
    name = "iql"
    _model_attrs = ("actor", "critic", "value")

    def __init__(self, config: IQLConfig = IQLConfig()):
        self.config = config
        self.actor_tx = make_optimizer(config.optimizer, config.actor_lr)
        self.critic_tx = make_optimizer(config.optimizer, config.critic_lr)
        self.value_tx = make_optimizer(config.optimizer, config.value_lr)

    def init(self, key: jax.Array, obs_space: spaces.Box, act_space: spaces.Box) -> IQLState:
        c = self.config
        self.act_dim = int(act_space.flat_dim)
        self.act_low = float(jnp.min(jnp.asarray(act_space.low)))
        self.act_high = float(jnp.max(jnp.asarray(act_space.high)))
        self._bind_models(
            actor=GaussianHeadMLP(act_dim=self.act_dim,
                                  hidden=tuple(c.actor_hidden)),
            critic=MLP(out_dim=1, hidden=tuple(c.critic_hidden)),
            value=MLP(out_dim=1, hidden=tuple(c.value_hidden)),
        )
        k_a, k_c, k_v = jax.random.split(key, 3)
        dummy_obs = obs_space.zero()[None]
        dummy_act = act_space.zero().reshape(1, -1)
        actor_params = self.actor.init(k_a, dummy_obs)
        critic_in = jnp.concatenate([dummy_obs, dummy_act], axis=-1)
        critic_params = jax.vmap(lambda k: self.critic.init(k, critic_in))(
            jax.random.split(k_c, c.n_critics)
        )
        value_params = self.value.init(k_v, dummy_obs)
        return IQLState(
            actor_params=actor_params,
            critic_params=critic_params,
            critic_target_params=jax.tree.map(jnp.copy, critic_params),
            value_params=value_params,
            actor_opt=self.actor_tx.init(actor_params),
            critic_opt=self.critic_tx.init(critic_params),
            value_opt=self.value_tx.init(value_params),
            n_opts=jnp.int32(0),
            n_samples=jnp.int32(0),
        )

    def _q(self, critic_params, obs, act) -> jax.Array:
        x = jnp.concatenate([obs, act.reshape(act.shape[0], -1)], axis=-1)
        return jax.vmap(lambda p: self.critic.apply(p, x)[:, 0])(critic_params)

    def select_action(self, state: IQLState, obs: jax.Array, key: jax.Array) -> jax.Array:
        mean, log_std = self.actor.apply(state.actor_params, obs)
        a, _ = gaussian.sample(
            key, mean, log_std, self.config.action_limit, self.act_low, self.act_high
        )
        return a

    def select_action_eval(self, state: IQLState, obs: jax.Array, key: jax.Array) -> jax.Array:
        mean, _ = self.actor.apply(state.actor_params, obs)
        if self.config.action_limit == "tanh":
            return jnp.tanh(mean)
        return jnp.clip(mean, self.act_low, self.act_high)

    def on_env_step(self, state: IQLState, n: int) -> IQLState:
        return state.replace(n_samples=state.n_samples + n)

    def update(
        self, state: IQLState, batch: TransitionBatch, key: jax.Array = None
    ) -> Tuple[IQLState, Dict[str, jax.Array], jax.Array]:
        c = self.config
        obs, act, next_obs, reward, terminated, _t, _i, weight = batch.unpack()
        act2d = act.reshape(act.shape[0], -1)
        reward = reward.astype(jnp.float32)

        # --- expectile value update (iql/base.rs:75-86)
        q_tgt = jnp.min(self._q(state.critic_target_params, obs, act2d), axis=0)
        q_tgt = jax.lax.stop_gradient(q_tgt)

        def value_loss(value_params):
            v = self.value.apply(value_params, obs)[:, 0]
            u = q_tgt - v
            w_exp = jnp.where(u < 0.0, 1.0 - c.expectile, c.expectile)
            return jnp.mean(w_exp * u**2), v

        (v_loss, v), v_grads = jax.value_and_grad(value_loss, has_aux=True)(
            state.value_params
        )
        v_grads = maybe_pmean(v_grads, self.axis_name)
        v_up, value_opt = self.value_tx.update(v_grads, state.value_opt, state.value_params)
        value_params = optax.apply_updates(state.value_params, v_up)

        # --- critic: target r + γ(1−d)·V(s') (iql/base.rs:88-121)
        v_next = self.value.apply(value_params, next_obs)[:, 0]
        target = jax.lax.stop_gradient(
            reward + bootstrap_discount(c.gamma, batch) * v_next
        )

        def critic_loss(critic_params):
            q = self._q(critic_params, obs, act2d)
            return jnp.mean(weight[None, :] * (q - target[None, :]) ** 2)

        c_loss, c_grads = jax.value_and_grad(critic_loss)(state.critic_params)
        c_grads = maybe_pmean(c_grads, self.axis_name)
        c_up, critic_opt = self.critic_tx.update(c_grads, state.critic_opt, state.critic_params)
        critic_params = optax.apply_updates(state.critic_params, c_up)

        # --- AWR actor (iql/base.rs:123-155)
        adv = q_tgt - jax.lax.stop_gradient(v)
        w = jax.lax.stop_gradient(
            jnp.minimum(jnp.exp(adv / c.lambda_), c.exp_adv_max)
        )

        def actor_loss(actor_params):
            mean, log_std = self.actor.apply(actor_params, obs)
            logp = gaussian.logp_of(act2d, mean, log_std, c.action_limit)
            return -jnp.mean(w * logp)

        a_loss, a_grads = jax.value_and_grad(actor_loss)(state.actor_params)
        a_grads = maybe_pmean(a_grads, self.axis_name)
        a_up, actor_opt = self.actor_tx.update(a_grads, state.actor_opt, state.actor_params)
        actor_params = optax.apply_updates(state.actor_params, a_up)

        critic_target_params = polyak_update(c.tau, critic_params, state.critic_target_params)
        q_now = jnp.min(self._q(critic_params, obs, act2d), axis=0)
        td_err = q_now - target
        metrics = {
            "loss_value": v_loss,
            "loss_critic": c_loss,
            "loss_actor": a_loss,
            "adv_mean": jnp.mean(adv),
            "v_mean": jnp.mean(v),
        }
        return (
            IQLState(
                actor_params, critic_params, critic_target_params, value_params,
                actor_opt, critic_opt, value_opt, state.n_opts + 1, state.n_samples,
            ),
            metrics,
            td_err,
        )

    def policy_params(self, state: IQLState) -> Any:
        return state.actor_params

    def sync_policy(self, state: IQLState, policy_params: Any) -> IQLState:
        return state.replace(actor_params=policy_params)
