"""Goal-conditioned planar reacher with dict observations.

≙ the reference's FetchReach-style dict-obs path: sac_fetch_reach example +
the candle dict-obs converters (border-py-gym-env/src/candle/*, SURVEY §2.6)
— the capability being exercised is Dict observation spaces flowing through
replay and agents.  Dynamics: 2-DoF arm on a plane, torque-controlled,
dense negative-distance reward, success at <0.05 distance (sparse bonus),
50-step episodes — the classic Fetch-style structure without MuJoCo.

Obs: {"observation": [4] (joint angles/vels), "achieved_goal": [2],
"desired_goal": [2]} — use :class:`FlattenDictWrapper` to feed MLP agents,
exactly how the reference's converters concatenate dict entries.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from border_tpu.core import spaces
from border_tpu.core.env import Environment

L1 = 0.5
L2 = 0.4


@struct.dataclass
class ReacherState:
    q: jax.Array  # [2] joint angles
    qd: jax.Array  # [2] joint velocities
    goal: jax.Array  # [2] target xy
    t: jax.Array


@struct.dataclass
class ReacherParams:
    dt: float = 0.05
    torque_scale: float = 1.0
    damping: float = 0.9
    success_radius: float = 0.05
    max_steps: int = struct.field(pytree_node=False, default=50)


def _fk(q: jax.Array) -> jax.Array:
    """End-effector xy from joint angles."""
    x = L1 * jnp.cos(q[0]) + L2 * jnp.cos(q[0] + q[1])
    y = L1 * jnp.sin(q[0]) + L2 * jnp.sin(q[0] + q[1])
    return jnp.stack([x, y])


class Reacher(Environment):
    name = "Reacher-v0"

    @property
    def default_params(self) -> ReacherParams:
        return ReacherParams()

    def observation_space(self, params) -> spaces.Dict:
        return spaces.Dict(
            {
                "observation": spaces.Box(-10.0, 10.0, (4,), jnp.float32),
                "achieved_goal": spaces.Box(-1.0, 1.0, (2,), jnp.float32),
                "desired_goal": spaces.Box(-1.0, 1.0, (2,), jnp.float32),
            }
        )

    def action_space(self, params) -> spaces.Box:
        return spaces.Box(-1.0, 1.0, (2,), jnp.float32)

    def _obs(self, state: ReacherState) -> Dict[str, jax.Array]:
        return {
            "observation": jnp.concatenate([state.q, state.qd]).astype(jnp.float32),
            "achieved_goal": _fk(state.q).astype(jnp.float32),
            "desired_goal": state.goal.astype(jnp.float32),
        }

    def reset_env(self, key, params):
        k1, k2, k3 = jax.random.split(key, 3)
        q = jax.random.uniform(k1, (2,), jnp.float32, -jnp.pi, jnp.pi)
        # goal uniformly in the reachable annulus
        r = jax.random.uniform(k2, (), jnp.float32, abs(L1 - L2) + 0.05, L1 + L2 - 0.05)
        th = jax.random.uniform(k3, (), jnp.float32, -jnp.pi, jnp.pi)
        goal = jnp.stack([r * jnp.cos(th), r * jnp.sin(th)])
        state = ReacherState(q=q, qd=jnp.zeros(2), goal=goal, t=jnp.int32(0))
        return self._obs(state), state

    def step_env(self, key, state, action, params):
        torque = jnp.clip(action.reshape(2), -1.0, 1.0) * params.torque_scale
        qd = params.damping * state.qd + torque * params.dt * 10.0
        qd = jnp.clip(qd, -8.0, 8.0)
        q = state.q + qd * params.dt
        q = ((q + jnp.pi) % (2 * jnp.pi)) - jnp.pi
        t = state.t + 1
        new = ReacherState(q=q, qd=qd, goal=state.goal, t=t)
        dist = jnp.linalg.norm(_fk(q) - state.goal)
        success = dist < params.success_radius
        reward = -dist + jnp.where(success, 1.0, 0.0)
        truncated = t >= params.max_steps
        return (
            self._obs(new),
            new,
            reward.astype(jnp.float32),
            jnp.bool_(False),
            truncated,
            {},
        )


class FlattenDictWrapper(Environment):
    """Dict obs → flat Box obs (≙ the reference's dict-obs converters
    concatenating entries for the MLP, border-py-gym-env/src/candle)."""

    def __init__(self, env: Environment, keys=None):
        self.env = env
        self.keys = keys
        self.name = env.name + "-flat"

    @property
    def default_params(self):
        return self.env.default_params

    def _keys(self, params):
        if self.keys is not None:
            return list(self.keys)
        return [k for k, _ in self.env.observation_space(params).spaces]

    def observation_space(self, params) -> spaces.Box:
        inner = self.env.observation_space(params).as_dict()
        dim = sum(inner[k].flat_dim for k in self._keys(params))
        return spaces.Box(-jnp.inf, jnp.inf, (dim,), jnp.float32)

    def action_space(self, params):
        return self.env.action_space(params)

    def _flatten(self, obs, params):
        return jnp.concatenate(
            [obs[k].reshape(-1) for k in self._keys(params)]
        ).astype(jnp.float32)

    def reset_env(self, key, params):
        obs, state = self.env.reset_env(key, params)
        return self._flatten(obs, params), state

    def step_env(self, key, state, action, params):
        obs, state, r, term, trunc, info = self.env.step_env(
            key, state, action, params
        )
        return self._flatten(obs, params), state, r, term, trunc, info

    def post_done_state(self, key, state, obs, params):
        new_obs, st = self.env.post_done_state(key, state, None, params)
        # post_done_state of inner env returns dict obs on reset
        if isinstance(new_obs, dict):
            new_obs = self._flatten(new_obs, params)
        return new_obs, st
