"""Implicit Quantile Networks agent.

TPU-native re-design of the reference Iqn agent
(border-tch-agent/src/iqn/base.rs:26-326):

- quantile model: ψ features ⊙ φ cosine embedding → f merge net
  (:class:`border_tpu.models.iqn.IQNNet` ≙ iqn/model/base.rs:23-239),
- τ-sampling strategies ≙ the IqnSample enum (iqn/model/base.rs:327-381):
  Uniform{8,10,32,64}, Const32 (midpoint grid), Median,
- critic update ≙ update_critic (iqn/base.rs:63-170): greedy next action by
  argmax of τ-averaged target Q, target quantiles
  ``r + γ(1−terminated)·Z'(s', a*)``, quantile Huber loss between predicted
  quantiles at τ_pred and target quantiles at τ_tgt,
- ε-greedy over τ-averaged action values (same explorer semantics as DQN),
- τ-polyak soft update every soft_update_interval opt steps.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from border_tpu.agents.common import (
    bootstrap_discount,
    make_optimizer,
    maybe_pmean,
    periodic_polyak,
    quantile_huber_loss,
)
from border_tpu.core.agent import Agent
from border_tpu.core import spaces
from border_tpu.models.iqn import IQNNet
from border_tpu.replay.buffer import TransitionBatch


def sample_taus(strategy: str, key: jax.Array, batch: int) -> jax.Array:
    """≙ IqnSample (iqn/model/base.rs:327-381). Returns [batch, K]."""
    if strategy.startswith("uniform"):
        k = int(strategy[len("uniform"):])
        return jax.random.uniform(key, (batch, k))
    if strategy.startswith("const"):
        k = int(strategy[len("const"):])
        mid = (jnp.arange(k, dtype=jnp.float32) + 0.5) / k
        return jnp.broadcast_to(mid, (batch, k))
    if strategy == "median":
        return jnp.full((batch, 1), 0.5, jnp.float32)
    raise ValueError(f"unknown tau strategy {strategy!r}")


@dataclasses.dataclass(frozen=True)
class IQNConfig:
    """≙ IqnConfig (border-tch-agent/src/iqn/config.rs:56-60 defaults)."""

    gamma: float = 0.99
    tau: float = 0.005
    soft_update_interval: int = 1
    sample_percents_pred: str = "uniform8"
    sample_percents_tgt: str = "uniform8"
    sample_percents_act: str = "const32"
    kappa: float = 1.0  # Huber threshold
    # exploration (shared DQN ε-greedy semantics)
    eps_start: float = 1.0
    eps_final: float = 0.02
    eps_final_step: int = 100_000
    optimizer: str = "adam"
    lr: float = 1e-3
    feature_dim: int = 64
    n_cos: int = 64
    hidden: Sequence[int] = (64,)
    psi_fn: Any = None  # optional CNN feature extractor factory


@struct.dataclass
class IQNState:
    params: Any
    target_params: Any
    opt_state: Any
    n_opts: jax.Array
    n_samples: jax.Array


class IQN(Agent):
    name = "iqn"
    _model_attrs = ("net",)

    def __init__(self, config: IQNConfig = IQNConfig()):
        self.config = config
        self.tx = make_optimizer(config.optimizer, config.lr)

    def init(self, key: jax.Array, obs_space: spaces.Space, act_space: spaces.Discrete) -> IQNState:
        c = self.config
        self.n_actions = act_space.n
        self._bind_models(net=IQNNet(
            out_dim=act_space.n,
            feature_dim=c.feature_dim,
            n_cos=c.n_cos,
            psi_hidden=tuple(c.hidden),
            f_hidden=tuple(c.hidden),
            psi_fn=c.psi_fn,
        ))
        dummy_obs = obs_space.zero()[None]
        dummy_tau = jnp.zeros((1, 8), jnp.float32)
        params = self.net.init(key, dummy_obs, dummy_tau)
        return IQNState(
            params=params,
            target_params=jax.tree.map(jnp.copy, params),
            opt_state=self.tx.init(params),
            n_opts=jnp.int32(0),
            n_samples=jnp.int32(0),
        )

    # -- acting: ε-greedy over τ-averaged Q (iqn/base.rs:211-241-analogue) -
    def _avg_q(self, params, obs, key) -> jax.Array:
        taus = sample_taus(self.config.sample_percents_act, key, obs.shape[0])
        z = self.net.apply(params, obs, taus)  # [B, K, A]
        return jnp.mean(z, axis=1)  # [B, A]

    def epsilon(self, state: IQNState) -> jax.Array:
        c = self.config
        frac = jnp.clip(state.n_samples.astype(jnp.float32) / c.eps_final_step, 0.0, 1.0)
        return c.eps_start + frac * (c.eps_final - c.eps_start)

    def select_action(self, state: IQNState, obs: jax.Array, key: jax.Array) -> jax.Array:
        k_tau, k_eps, k_rand = jax.random.split(key, 3)
        q = self._avg_q(state.params, obs, k_tau)
        greedy = jnp.argmax(q, axis=-1).astype(jnp.int32)
        random = jax.random.randint(k_rand, greedy.shape, 0, self.n_actions)
        explore = jax.random.uniform(k_eps, greedy.shape) < self.epsilon(state)
        return jnp.where(explore, random, greedy)

    def select_action_eval(self, state: IQNState, obs: jax.Array, key: jax.Array) -> jax.Array:
        q = self._avg_q(state.params, obs, key)
        return jnp.argmax(q, axis=-1).astype(jnp.int32)

    def on_env_step(self, state: IQNState, n: int) -> IQNState:
        return state.replace(n_samples=state.n_samples + n)

    # -- learning (≙ update_critic, iqn/base.rs:63-170) --------------------
    def update(
        self, state: IQNState, batch: TransitionBatch, key: jax.Array = None
    ) -> Tuple[IQNState, Dict[str, jax.Array], jax.Array]:
        c = self.config
        obs, act, next_obs, reward, terminated, _trunc, _ix, weight = batch.unpack()
        act = act.astype(jnp.int32)
        reward = reward.astype(jnp.float32)
        B = reward.shape[0]
        k_pred, k_tgt, k_act = jax.random.split(key, 3)

        # next action: argmax of τ-averaged target Q
        a_star = jnp.argmax(self._avg_q(state.target_params, next_obs, k_act), axis=-1)
        taus_tgt = sample_taus(c.sample_percents_tgt, k_tgt, B)
        z_next = self.net.apply(state.target_params, next_obs, taus_tgt)  # [B, Kt, A]
        z_next_a = jnp.take_along_axis(
            z_next, a_star[:, None, None], axis=-1
        )[..., 0]  # [B, Kt]
        tgt = reward[:, None] + bootstrap_discount(c.gamma, batch)[:, None] * z_next_a
        tgt = jax.lax.stop_gradient(tgt)

        taus_pred = sample_taus(c.sample_percents_pred, k_pred, B)

        def loss(params):
            z = self.net.apply(params, obs, taus_pred)  # [B, Kp, A]
            pred = jnp.take_along_axis(z, act[:, None, None], axis=-1)[..., 0]
            per_sample = quantile_huber_loss(pred, tgt, taus_pred, c.kappa)
            return jnp.mean(weight * per_sample), pred

        (loss_val, pred), grads = jax.value_and_grad(loss, has_aux=True)(state.params)
        grads = maybe_pmean(grads, self.axis_name)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        n_opts = state.n_opts + 1
        target_params = periodic_polyak(
            n_opts, c.soft_update_interval, c.tau, params, state.target_params
        )
        # PER priority: mean TD over quantile pairs
        td_err = jnp.mean(pred, axis=1) - jnp.mean(tgt, axis=1)
        metrics = {"loss": loss_val, "q_mean": jnp.mean(pred), "epsilon": self.epsilon(state)}
        return (
            IQNState(params, target_params, opt_state, n_opts, state.n_samples),
            metrics,
            td_err,
        )

    def policy_params(self, state: IQNState) -> Any:
        return state.params

    def sync_policy(self, state: IQNState, policy_params: Any) -> IQNState:
        return state.replace(params=policy_params)
