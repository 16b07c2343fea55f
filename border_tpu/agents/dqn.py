"""DQN agent: double-DQN, PER weighting, ε-greedy/softmax exploration.

TPU-native re-design of the reference Dqn agent
(border-tch-agent/src/dqn/base.rs:23-402):

- critic update ≙ update_critic (:60-160): target
  ``r + γ·(1−terminated)·Q'`` with the double-DQN argmax switch (:91-105),
  smooth-L1 or MSE loss, PER importance weights and |td| priority feedback
  (:123-152),
- exploration ≙ DqnExplorer (dqn/explorer.rs:9-135): ε-greedy with linear
  decay eps_start→eps_final over final_step env steps, or softmax
  (multinomial over Q logits),
- soft update every ``soft_update_interval`` opt steps by τ-polyak
  (:182-200).

The whole update is one jitted function over a DQNState pytree; action
selection is batched over the vectorized env axis (the reference runs one
forward per env step at batch=1 — dqn/base.rs:211-241 — which on TPU becomes
a single [num_envs, obs] forward).
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
    periodic_polyak,
)
from border_tpu.core.agent import Agent
from border_tpu.core import spaces
from border_tpu.models.mlp import MLP
from border_tpu.replay.buffer import TransitionBatch


@dataclasses.dataclass(frozen=True)
class DQNConfig:
    """≙ DqnConfig (border-tch-agent/src/dqn/config.rs:26-219)."""

    gamma: float = 0.99
    tau: float = 0.005
    soft_update_interval: int = 1
    double_dqn: bool = False
    loss: str = "smooth_l1"  # "smooth_l1" | "mse"
    # exploration (≙ DqnExplorer, dqn/explorer.rs:9-135)
    explorer: str = "epsilon_greedy"  # "epsilon_greedy" | "softmax"
    eps_start: float = 1.0
    eps_final: float = 0.02
    eps_final_step: int = 100_000
    # optimizer (≙ OptimizerConfig, opt.rs:13-84)
    optimizer: str = "adam"
    lr: float = 1e-3
    # linear lr decay lr → lr·lr_final_frac over lr_decay_steps optimizer
    # steps (None: constant lr, the reference's behavior).  Decaying the lr
    # pins the end-of-run policy so final-window gates measure a converged
    # policy, not the oscillation phase.
    lr_decay_steps: Optional[int] = None
    lr_final_frac: float = 0.05
    max_grad_norm: Optional[float] = None
    # model
    hidden: Sequence[int] = (64, 64)
    dueling: bool = False  # dueling V+A head (beyond-reference stabilizer)
    model: Any = None  # optional custom flax module factory (e.g. AtariCNN)
    # next_obs forward strategy for the double-DQN TD target:
    #   "stacked"  — ONE vmapped apply over stacked {params, target_params}
    #                (same FLOPs, half the dispatches; numerics-identical —
    #                test_agents).  Measured ≥ "separate" at every batch
    #                size on the fused Pong CNN config
    #                (artifacts/update_variants_inscan_steady.json).
    #   "separate" — online-argmax forward and target forward as two
    #                applies (the reference's shape, dqn/base.rs:91-105).
    #                ~20% faster than stacked for the tiny-MLP configs
    #                (vmapped-params GEMMs pay more than they save there).
    #   None       — auto: "stacked" for custom models (the CNN path),
    #                "separate" for the built-in MLPs.
    next_forward: Optional[str] = None
    # Clip PER-TRANSITION rewards to [-c, c] at update time.  Only valid
    # with 1-step buffers: an n-step batch's reward is the accumulated
    # return, and clipping the sum diverges from canonical n-step DQN
    # (which clips each r_k before accumulation) — the Trainer rejects the
    # combination (sign-clip env-side instead, as the Atari envs do).
    clip_reward: Optional[float] = None


@struct.dataclass
class DQNState:
    params: Any
    target_params: Any
    opt_state: Any
    n_opts: jax.Array  # optimizer steps (≙ Agent opt counter)
    n_samples: jax.Array  # env steps seen (drives ε decay)


class DQN(Agent):
    name = "dqn"
    _model_attrs = ("net",)

    def __init__(self, config: DQNConfig = DQNConfig()):
        if config.next_forward not in (None, "stacked", "separate"):
            from border_tpu.errors import ConfigError

            raise ConfigError(
                f"next_forward must be 'stacked', 'separate', or None "
                f"(auto), got {config.next_forward!r}"
            )
        self.config = config
        self.tx = self._make_tx()

    def _make_tx(self) -> optax.GradientTransformation:
        c = self.config
        lr = c.lr
        if c.lr_decay_steps:
            lr = optax.linear_schedule(
                c.lr, c.lr * c.lr_final_frac, c.lr_decay_steps
            )
        tx = make_optimizer(c.optimizer, lr)
        if c.max_grad_norm is not None:
            tx = optax.chain(optax.clip_by_global_norm(c.max_grad_norm), tx)
        return tx

    # -- construction ------------------------------------------------------
    def init(self, key: jax.Array, obs_space: spaces.Space, act_space: spaces.Discrete) -> DQNState:
        if self.config.model is not None:
            net = self.config.model(act_space.n)
        elif self.config.dueling:
            from border_tpu.models.mlp import DuelingMLP

            net = DuelingMLP(
                out_dim=act_space.n, hidden=tuple(self.config.hidden)
            )
        else:
            net = MLP(out_dim=act_space.n, hidden=tuple(self.config.hidden))
        self._bind_models(net=net)
        dummy = obs_space.zero()[None]
        params = self.net.init(key, dummy)
        return DQNState(
            params=params,
            target_params=jax.tree.map(jnp.copy, params),
            opt_state=self.tx.init(params),
            n_opts=jnp.int32(0),
            n_samples=jnp.int32(0),
        )

    # -- acting ------------------------------------------------------------
    def epsilon(self, state: DQNState) -> jax.Array:
        c = self.config
        frac = jnp.clip(
            state.n_samples.astype(jnp.float32) / c.eps_final_step, 0.0, 1.0
        )
        return c.eps_start + frac * (c.eps_final - c.eps_start)

    def select_action(self, state: DQNState, obs: jax.Array, key: jax.Array) -> jax.Array:
        q = self.net.apply(state.params, obs)  # [B, A]
        if self.config.explorer == "softmax":
            # ≙ Softmax explorer: multinomial over Q logits (explorer.rs)
            return jax.random.categorical(key, q, axis=-1).astype(jnp.int32)
        k1, k2 = jax.random.split(key)
        greedy = jnp.argmax(q, axis=-1).astype(jnp.int32)
        random = jax.random.randint(k2, greedy.shape, 0, q.shape[-1])
        explore = jax.random.uniform(k1, greedy.shape) < self.epsilon(state)
        return jnp.where(explore, random, greedy)

    def select_action_eval(self, state: DQNState, obs: jax.Array, key: jax.Array) -> jax.Array:
        q = self.net.apply(state.params, obs)
        return jnp.argmax(q, axis=-1).astype(jnp.int32)

    def on_env_step(self, state: DQNState, n: int) -> DQNState:
        return state.replace(n_samples=state.n_samples + n)

    # -- learning (≙ update_critic, dqn/base.rs:60-160) --------------------
    def update(
        self, state: DQNState, batch: TransitionBatch, key: jax.Array = None
    ) -> Tuple[DQNState, Dict[str, jax.Array], jax.Array]:
        c = self.config
        obs, act, next_obs, reward, terminated, _trunc, _ix, weight = batch.unpack()
        act = act.astype(jnp.int32)
        reward = reward.astype(jnp.float32)
        if c.clip_reward is not None:
            reward = jnp.clip(reward, -c.clip_reward, c.clip_reward)

        next_forward = c.next_forward or (
            "stacked" if c.model is not None else "separate"
        )
        if next_forward == "stacked" and c.double_dqn:
            # one vmapped forward over stacked {online, target} params —
            # numerically identical to the two separate applies
            both = jax.tree.map(
                lambda a, b: jnp.stack([a, b]), state.params, state.target_params
            )
            q2 = jax.vmap(lambda p: self.net.apply(p, next_obs))(both)
            q_next_on, q_next_tgt = q2[0], q2[1]  # [B, A] each
            a_star = jnp.argmax(q_next_on, axis=-1)
        else:
            q_next_tgt = self.net.apply(state.target_params, next_obs)  # [B, A]
            if c.double_dqn:
                # argmax from online net, value from target (dqn/base.rs:91-105)
                a_star = jnp.argmax(self.net.apply(state.params, next_obs), axis=-1)
            else:
                a_star = jnp.argmax(q_next_tgt, axis=-1)
        q_next = jnp.take_along_axis(q_next_tgt, a_star[:, None], axis=-1)[:, 0]
        target = reward + bootstrap_discount(c.gamma, batch) * q_next
        target = jax.lax.stop_gradient(target)

        loss_fn = CRITIC_LOSSES[c.loss]

        def loss(params):
            q = self.net.apply(params, obs)
            pred = jnp.take_along_axis(q, act[:, None], axis=-1)[:, 0]
            per_elem = loss_fn(pred, target)
            return jnp.mean(weight * per_elem), pred

        (loss_val, pred), grads = jax.value_and_grad(loss, has_aux=True)(state.params)
        grads = maybe_pmean(grads, self.axis_name)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        n_opts = state.n_opts + 1
        target_params = periodic_polyak(
            n_opts, c.soft_update_interval, c.tau, params, state.target_params
        )
        td_err = pred - target
        metrics = {
            "loss": loss_val,
            "q_mean": jnp.mean(pred),
            "epsilon": self.epsilon(state),
        }
        new_state = DQNState(
            params=params,
            target_params=target_params,
            opt_state=opt_state,
            n_opts=n_opts,
            n_samples=state.n_samples,
        )
        return new_state, metrics, td_err

    # -- sync (≙ SyncModel impl, dqn/base.rs:373-402) ----------------------
    def policy_params(self, state: DQNState) -> Any:
        return state.params

    def sync_policy(self, state: DQNState, policy_params: Any) -> DQNState:
        return state.replace(params=policy_params)
