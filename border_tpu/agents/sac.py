"""Soft Actor-Critic.

TPU-native re-design of the reference Sac agent
(border-tch-agent/src/sac/base.rs:32-387; candle twin
border-candle-agent/src/sac/base.rs):

- squashed Gaussian policy ``a = tanh(μ + σ·z)·scale`` with the tanh
  log-prob Jacobian correction (≙ sac/base.rs:73-87; GaussianActor logp,
  border-candle-agent/src/util/actor.rs:19-305),
- n-critic min-Q ensemble (≙ :96-105; MultiCritic,
  border-candle-agent/src/util/critic.rs:18-366) — here the ensemble is a
  *stacked-parameter vmap*, so all critics ride one batched matmul instead
  of n sequential ones,
- critic target ``r·scale + γ(1−terminated)(minQ' − α·logπ')`` (:107-149),
- actor loss ``α·logπ − minQ`` (:151-167),
- automatic entropy coefficient: EntCoef Fix | Auto(target_entropy, lr)
  (≙ sac/ent_coef.rs:9-94),
- per-update τ-polyak target update (≙ sac/base.rs soft update each inner
  step).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from border_tpu.agents.common import (
    CRITIC_LOSSES,
    bootstrap_discount,
    make_optimizer,
    maybe_pmean,
    polyak_update,
)
from border_tpu.core.agent import Agent
from border_tpu.core import spaces
from border_tpu.models.mlp import MLP, GaussianHeadMLP
from border_tpu.replay.buffer import TransitionBatch

LOG_2 = 0.6931471805599453


@dataclasses.dataclass(frozen=True)
class SACConfig:
    """≙ SacConfig (border-tch-agent/src/sac/config.rs:23-207)."""

    gamma: float = 0.99
    tau: float = 0.005
    n_critics: int = 2
    reward_scale: float = 1.0
    critic_loss: str = "mse"
    # entropy coefficient (≙ EntCoef, sac/ent_coef.rs:9-94)
    ent_coef_mode: str = "auto"  # "auto" | "fix"
    ent_coef_init: float = 1.0
    target_entropy: Optional[float] = None  # default: -act_dim
    ent_lr: float = 3e-4
    # optimizers
    actor_lr: float = 3e-4
    critic_lr: float = 3e-4
    optimizer: str = "adam"
    # models
    actor_hidden: Sequence[int] = (64, 64)
    critic_hidden: Sequence[int] = (64, 64)


@struct.dataclass
class SACState:
    actor_params: Any
    critic_params: Any  # stacked [n_critics, ...] pytree
    critic_target_params: Any
    log_alpha: jax.Array
    actor_opt: Any
    critic_opt: Any
    alpha_opt: Any
    n_opts: jax.Array
    n_samples: jax.Array


class SAC(Agent):
    name = "sac"
    _model_attrs = ("actor", "critic")

    def __init__(self, config: SACConfig = SACConfig()):
        self.config = config
        self.actor_tx = make_optimizer(config.optimizer, config.actor_lr)
        self.critic_tx = make_optimizer(config.optimizer, config.critic_lr)
        self.alpha_tx = make_optimizer("adam", config.ent_lr)

    # -- construction ------------------------------------------------------
    def init(self, key: jax.Array, obs_space: spaces.Box, act_space: spaces.Box) -> SACState:
        c = self.config
        self.act_dim = int(act_space.flat_dim)
        # action scaling tanh(u)·scale + bias to match env bounds
        low = jnp.broadcast_to(jnp.asarray(act_space.low, jnp.float32), act_space.shape)
        high = jnp.broadcast_to(jnp.asarray(act_space.high, jnp.float32), act_space.shape)
        self.act_scale = (high - low) / 2.0
        self.act_bias = (high + low) / 2.0
        self.target_entropy = (
            c.target_entropy if c.target_entropy is not None else -float(self.act_dim)
        )
        self._bind_models(
            actor=GaussianHeadMLP(act_dim=self.act_dim,
                                  hidden=tuple(c.actor_hidden)),
            critic=MLP(out_dim=1, hidden=tuple(c.critic_hidden)),
        )

        k_actor, k_critic = jax.random.split(key)
        dummy_obs = obs_space.zero()[None]
        dummy_act = act_space.zero().reshape(1, -1)
        actor_params = self.actor.init(k_actor, dummy_obs)
        critic_in = jnp.concatenate([dummy_obs, dummy_act], axis=-1)
        critic_params = jax.vmap(lambda k: self.critic.init(k, critic_in))(
            jax.random.split(k_critic, c.n_critics)
        )
        log_alpha = jnp.log(jnp.float32(c.ent_coef_init))
        return SACState(
            actor_params=actor_params,
            critic_params=critic_params,
            critic_target_params=jax.tree.map(jnp.copy, critic_params),
            log_alpha=log_alpha,
            actor_opt=self.actor_tx.init(actor_params),
            critic_opt=self.critic_tx.init(critic_params),
            alpha_opt=self.alpha_tx.init(log_alpha),
            n_opts=jnp.int32(0),
            n_samples=jnp.int32(0),
        )

    # -- policy ------------------------------------------------------------
    def _sample_action(self, actor_params, obs, key):
        """Squashed-Gaussian sample + log-prob (≙ sac/base.rs:73-87)."""
        mean, log_std = self.actor.apply(actor_params, obs)
        std = jnp.exp(log_std)
        z = jax.random.normal(key, mean.shape)
        u = mean + std * z
        a = jnp.tanh(u)
        # log N(u; μ, σ) − Σ log(1 − tanh²(u)) with the numerically stable
        # form log(1 − tanh²(u)) = 2·(log2 − u − softplus(−2u)).
        log_prob = jnp.sum(
            -0.5 * (z**2) - log_std - 0.5 * jnp.log(2.0 * jnp.pi), axis=-1
        )
        log_prob -= jnp.sum(
            2.0 * (LOG_2 - u - jax.nn.softplus(-2.0 * u)), axis=-1
        )
        action = a * self.act_scale + self.act_bias
        return action, log_prob

    def select_action(self, state: SACState, obs: jax.Array, key: jax.Array) -> jax.Array:
        action, _ = self._sample_action(state.actor_params, obs, key)
        return action

    def select_action_eval(self, state: SACState, obs: jax.Array, key: jax.Array) -> jax.Array:
        mean, _ = self.actor.apply(state.actor_params, obs)
        return jnp.tanh(mean) * self.act_scale + self.act_bias

    def on_env_step(self, state: SACState, n: int) -> SACState:
        return state.replace(n_samples=state.n_samples + n)

    # -- critic ensemble ---------------------------------------------------
    def _q_values(self, critic_params, obs, act) -> jax.Array:
        """[n_critics, B] Q-values via stacked-params vmap (≙ MultiCritic
        qvals, util/critic.rs:18-366)."""
        x = jnp.concatenate([obs, act.reshape(act.shape[0], -1)], axis=-1)
        return jax.vmap(lambda p: self.critic.apply(p, x)[:, 0])(critic_params)

    # -- learning ----------------------------------------------------------
    def update(
        self, state: SACState, batch: TransitionBatch, key: jax.Array = None
    ) -> Tuple[SACState, Dict[str, jax.Array], jax.Array]:
        c = self.config
        obs, act, next_obs, reward, terminated, _trunc, _ix, weight = batch.unpack()
        reward = reward.astype(jnp.float32) * c.reward_scale
        k_next, k_actor = jax.random.split(key)
        alpha = jnp.exp(state.log_alpha)

        # --- critic target (≙ sac/base.rs:107-149)
        next_act, next_logp = self._sample_action(state.actor_params, next_obs, k_next)
        q_next = self._q_values(state.critic_target_params, next_obs, next_act)
        min_q_next = jnp.min(q_next, axis=0)  # min over ensemble (:96-105)
        target = reward + bootstrap_discount(c.gamma, batch) * (
            min_q_next - alpha * next_logp
        )
        target = jax.lax.stop_gradient(target)
        loss_fn = CRITIC_LOSSES[c.critic_loss]

        def critic_loss(critic_params):
            q = self._q_values(critic_params, obs, act)  # [n, B]
            per = loss_fn(q, target[None, :])
            return jnp.mean(weight[None, :] * per), jnp.mean(q, axis=1)

        (c_loss, q_means), c_grads = jax.value_and_grad(critic_loss, has_aux=True)(
            state.critic_params
        )
        c_grads = maybe_pmean(c_grads, self.axis_name)
        c_updates, critic_opt = self.critic_tx.update(
            c_grads, state.critic_opt, state.critic_params
        )
        critic_params = optax.apply_updates(state.critic_params, c_updates)

        # --- actor loss α·logπ − minQ (≙ sac/base.rs:151-167)
        def actor_loss(actor_params):
            a, logp = self._sample_action(actor_params, obs, k_actor)
            q = self._q_values(critic_params, obs, a)
            min_q = jnp.min(q, axis=0)
            return jnp.mean(alpha * logp - min_q), logp

        (a_loss, logp), a_grads = jax.value_and_grad(actor_loss, has_aux=True)(
            state.actor_params
        )
        a_grads = maybe_pmean(a_grads, self.axis_name)
        a_updates, actor_opt = self.actor_tx.update(
            a_grads, state.actor_opt, state.actor_params
        )
        actor_params = optax.apply_updates(state.actor_params, a_updates)

        # --- entropy coefficient (≙ EntCoef::Auto, sac/ent_coef.rs:9-94)
        if c.ent_coef_mode == "auto":
            def alpha_loss(log_alpha):
                return -jnp.mean(
                    log_alpha * jax.lax.stop_gradient(logp + self.target_entropy)
                )

            al_loss, al_grad = jax.value_and_grad(alpha_loss)(state.log_alpha)
            al_grad = maybe_pmean(al_grad, self.axis_name)
            al_updates, alpha_opt = self.alpha_tx.update(
                al_grad, state.alpha_opt, state.log_alpha
            )
            log_alpha = optax.apply_updates(state.log_alpha, al_updates)
        else:
            al_loss = jnp.float32(0.0)
            alpha_opt = state.alpha_opt
            log_alpha = state.log_alpha

        critic_target_params = polyak_update(
            c.tau, critic_params, state.critic_target_params
        )
        # TD error for PER: mean over ensemble of (Q − target)
        q_now = self._q_values(critic_params, obs, act)
        td_err = jnp.mean(q_now, axis=0) - target

        metrics = {
            "loss_critic": c_loss,
            "loss_actor": a_loss,
            "loss_alpha": al_loss,
            "ent_coef": jnp.exp(log_alpha),
            "entropy": -jnp.mean(logp),
            "q_mean": jnp.mean(q_means),
        }
        new_state = SACState(
            actor_params=actor_params,
            critic_params=critic_params,
            critic_target_params=critic_target_params,
            log_alpha=log_alpha,
            actor_opt=actor_opt,
            critic_opt=critic_opt,
            alpha_opt=alpha_opt,
            n_opts=state.n_opts + 1,
            n_samples=state.n_samples,
        )
        return new_state, metrics, td_err

    def policy_params(self, state: SACState) -> Any:
        return state.actor_params

    def sync_policy(self, state: SACState, policy_params: Any) -> SACState:
        return state.replace(actor_params=policy_params)
