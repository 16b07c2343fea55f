"""Functional environment contract.

TPU-native analogue of the ``Env`` trait (border-core/src/base/env.rs:45-181)
and ``Step`` (border-core/src/base/step.rs:68-226).  Where the reference holds
one mutable env behind ``step(&act)``, an :class:`Environment` here is a bundle
of *pure functions over pytrees*, so thousands of instances run in lockstep
under ``jax.vmap`` inside a single jitted program:

- ``reset(key, params) -> (obs, state)``             ≙ Env::reset
- ``step(key, state, action, params) -> Timestep``   ≙ Env::step
- auto-reset is fused into :class:`VecEnv.step`      ≙ Env::step_with_reset
  (border-core/src/base/env.rs:138-160): when an episode ends, the returned
  ``obs`` is already the next episode's first observation and the true
  terminal observation is reported as ``final_obs`` — the batched analogue of
  ``Step.init_obs`` bookkeeping in SimpleStepProcessor
  (border-core/src/generic_replay_buffer/step_proc.rs:103-137).
- deterministic seeded evaluation resets             ≙ Env::reset_with_index
  (border-core/src/base/env.rs:162-180) via ``jax.random.fold_in``.

The Gymnasium termination split is preserved: ``terminated`` ends the MDP
(no bootstrap), ``truncated`` is a time-limit cut (still bootstraps), matching
Step::is_done semantics (border-core/src/base/step.rs:68-92) and the critic
targets in the reference agents (border-tch-agent/src/dqn/base.rs:91-105).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from border_tpu.core import spaces

EnvParams = Any  # static or pytree hyperparameters of the dynamics
EnvState = Any  # pytree dynamic state


@struct.dataclass
class Timestep:
    """One transition's worth of information (≙ border-core Step).

    ``obs`` is the observation the *policy* should act on next (post
    auto-reset); ``final_obs`` is the observation that actually followed the
    action (pre auto-reset) and is what belongs in the replay transition's
    ``next_obs`` slot.
    """

    obs: Any
    final_obs: Any
    reward: jax.Array
    terminated: jax.Array
    truncated: jax.Array
    info: Dict[str, Any]

    @property
    def done(self) -> jax.Array:
        """Episode boundary (≙ Step::is_done, step.rs:136-138)."""
        return jnp.logical_or(self.terminated, self.truncated)


class Environment:
    """Base class for pure-JAX environments.

    Subclasses implement single-instance dynamics; batching is applied
    externally via vmap (see :class:`VecEnv`).  All methods must be traceable:
    static shapes, no Python control flow on traced values.
    """

    # -- static metadata ---------------------------------------------------
    name: str = "Environment"

    @property
    def default_params(self) -> EnvParams:
        raise NotImplementedError

    def observation_space(self, params: EnvParams) -> spaces.Space:
        raise NotImplementedError

    def action_space(self, params: EnvParams) -> spaces.Space:
        raise NotImplementedError

    # -- dynamics ----------------------------------------------------------
    def reset_env(self, key: jax.Array, params: EnvParams) -> Tuple[Any, EnvState]:
        raise NotImplementedError

    def step_env(
        self, key: jax.Array, state: EnvState, action: jax.Array, params: EnvParams
    ) -> Tuple[Any, EnvState, jax.Array, jax.Array, jax.Array, Dict[str, Any]]:
        """Returns (obs, state, reward, terminated, truncated, info)."""
        raise NotImplementedError

    def post_done_state(
        self, key: jax.Array, state: EnvState, obs: Any, params: EnvParams
    ) -> Tuple[Any, EnvState]:
        """State to continue from after a ``done`` flag — defaults to a fresh
        reset.  Pixel envs override this for episodic-life semantics
        (life loss ends the *learning* episode but the game continues,
        ≙ border-atari-env/src/env.rs:263-299): they return the current
        state unchanged unless the game is really over."""
        return self.reset_env(key, params)

    # -- convenience single-env API (reset/step with auto-reset fused) -----
    @partial(jax.jit, static_argnums=(0,))
    def reset(self, key: jax.Array, params: Optional[EnvParams] = None):
        params = self.default_params if params is None else params
        return self.reset_env(key, params)

    @partial(jax.jit, static_argnums=(0,))
    def step(
        self,
        key: jax.Array,
        state: EnvState,
        action: jax.Array,
        params: Optional[EnvParams] = None,
    ) -> Tuple[Timestep, EnvState]:
        """Single-instance step with fused auto-reset (≙ step_with_reset)."""
        params = self.default_params if params is None else params
        key_step, key_reset = jax.random.split(key)
        obs_st, st, reward, term, trunc, info = self.step_env(
            key_step, state, action, params
        )
        obs_re, st_re = self.post_done_state(key_reset, st, obs_st, params)
        done = jnp.logical_or(term, trunc)
        state = jax.tree.map(
            lambda a, b: jax.lax.select(done, a, b), st_re, st
        )
        obs = jax.tree.map(lambda a, b: jax.lax.select(done, a, b), obs_re, obs_st)
        ts = Timestep(
            obs=obs,
            final_obs=obs_st,
            reward=reward,
            terminated=term,
            truncated=trunc,
            info=info,
        )
        return ts, state


@struct.dataclass
class VecEnvState:
    """Batched env state plus per-instance episode bookkeeping.

    ``episode_return``/``episode_length`` accumulate the running episode and
    ``last_return``/``last_length`` freeze at each boundary — the batched
    analogue of the per-step ``episode_length`` record emitted by GymEnv
    (border-py-gym-env/src/base.rs:322-325).
    """

    env_state: Any
    obs: Any
    episode_return: jax.Array
    episode_length: jax.Array
    last_return: jax.Array
    last_length: jax.Array
    key: jax.Array


class VecEnv:
    """N lockstep instances of an :class:`Environment` via vmap.

    This is the TPU replacement for the reference's N actor threads each
    owning one env (border-async-trainer/src/actor/base.rs:120-178): the
    "actors" become an array axis.
    """

    def __init__(self, env: Environment, num_envs: int, params: Optional[EnvParams] = None):
        self.env = env
        self.num_envs = num_envs
        self.params = env.default_params if params is None else params

    @property
    def observation_space(self) -> spaces.Space:
        return self.env.observation_space(self.params)

    @property
    def action_space(self) -> spaces.Space:
        return self.env.action_space(self.params)

    @partial(jax.jit, static_argnums=(0,))
    def reset(self, key: jax.Array) -> VecEnvState:
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, self.num_envs)
        obs, st = jax.vmap(self.env.reset_env, in_axes=(0, None))(keys, self.params)
        zeros_f = jnp.zeros((self.num_envs,), jnp.float32)
        zeros_i = jnp.zeros((self.num_envs,), jnp.int32)
        return VecEnvState(
            env_state=st,
            obs=obs,
            episode_return=zeros_f,
            episode_length=zeros_i,
            last_return=zeros_f,
            last_length=zeros_i,
            key=key,
        )

    @partial(jax.jit, static_argnums=(0,))
    def step(self, state: VecEnvState, action: jax.Array) -> Tuple[Timestep, VecEnvState]:
        key, k1, k2 = jax.random.split(state.key, 3)
        step_keys = jax.random.split(k1, self.num_envs)
        reset_keys = jax.random.split(k2, self.num_envs)

        obs_st, st, reward, term, trunc, info = jax.vmap(
            self.env.step_env, in_axes=(0, 0, 0, None)
        )(step_keys, state.env_state, action, self.params)
        done = jnp.logical_or(term, trunc)

        # Fused batched auto-reset: lax.select per instance on the done flag.
        obs_re, st_re = jax.vmap(
            self.env.post_done_state, in_axes=(0, 0, 0, None)
        )(reset_keys, st, obs_st, self.params)
        select = lambda a, b: jax.vmap(jax.lax.select)(done, a, b)
        new_state = jax.tree.map(select, st_re, st)
        sel_obs = lambda a, b: jnp.where(
            done.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
        )
        obs = jax.tree.map(sel_obs, obs_re, obs_st)

        ep_ret = state.episode_return + reward
        ep_len = state.episode_length + 1
        new_vec = VecEnvState(
            env_state=new_state,
            obs=obs,
            episode_return=jnp.where(done, 0.0, ep_ret),
            episode_length=jnp.where(done, 0, ep_len),
            last_return=jnp.where(done, ep_ret, state.last_return),
            last_length=jnp.where(done, ep_len, state.last_length),
            key=key,
        )
        ts = Timestep(
            obs=obs,
            final_obs=obs_st,
            reward=reward,
            terminated=term,
            truncated=trunc,
            info=info,
        )
        return ts, new_vec

    def reset_with_index(self, base_key: jax.Array, index) -> VecEnvState:
        """Deterministic per-index reset for evaluation
        (≙ Env::reset_with_index, env.rs:162-180)."""
        return self.reset(jax.random.fold_in(base_key, index))
