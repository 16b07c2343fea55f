"""Classic-control dynamics in pure JAX.

Replaces border-py-gym-env's Gymnasium-over-pyo3 path
(border-py-gym-env/src/base.rs:268-340 GymEnv::step) for the parity configs
(DQN-CartPole, SAC-Pendulum — BASELINE.md).  Physics constants and reward
shapes follow the public Gymnasium definitions so return-vs-steps curves are
directly comparable with the reference's runs.

All envs: float32 state, static shapes, no host round-trips; time-limit
truncation lives *inside* the dynamics (a step counter in the state pytree),
preserving the Gymnasium terminated/truncated split the reference relies on
(border-core/src/base/step.rs:68-92).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from border_tpu.core import spaces
from border_tpu.core.env import Environment


@struct.dataclass
class CartPoleState:
    x: jax.Array
    x_dot: jax.Array
    theta: jax.Array
    theta_dot: jax.Array
    t: jax.Array


@struct.dataclass
class CartPoleParams:
    gravity: float = 9.8
    masscart: float = 1.0
    masspole: float = 0.1
    length: float = 0.5  # half pole length
    force_mag: float = 10.0
    tau: float = 0.02
    theta_threshold: float = 12 * 2 * jnp.pi / 360
    x_threshold: float = 2.4
    max_steps: int = struct.field(pytree_node=False, default=500)


class CartPole(Environment):
    """CartPole-v1: discrete(2), reward 1/step, 500-step limit."""

    name = "CartPole-v1"

    @property
    def default_params(self) -> CartPoleParams:
        return CartPoleParams()

    def observation_space(self, params) -> spaces.Box:
        high = jnp.array([4.8, jnp.inf, 0.418, jnp.inf], jnp.float32)
        return spaces.Box(-high, high, (4,), jnp.float32)

    def action_space(self, params) -> spaces.Discrete:
        return spaces.Discrete(2)

    def reset_env(self, key, params):
        init = jax.random.uniform(key, (4,), jnp.float32, -0.05, 0.05)
        state = CartPoleState(init[0], init[1], init[2], init[3], jnp.int32(0))
        return self._obs(state), state

    def _obs(self, s: CartPoleState) -> jax.Array:
        return jnp.stack([s.x, s.x_dot, s.theta, s.theta_dot]).astype(jnp.float32)

    def step_env(self, key, state, action, params):
        force = jnp.where(action == 1, params.force_mag, -params.force_mag)
        costheta = jnp.cos(state.theta)
        sintheta = jnp.sin(state.theta)
        total_mass = params.masscart + params.masspole
        polemass_length = params.masspole * params.length

        temp = (
            force + polemass_length * state.theta_dot**2 * sintheta
        ) / total_mass
        thetaacc = (params.gravity * sintheta - costheta * temp) / (
            params.length
            * (4.0 / 3.0 - params.masspole * costheta**2 / total_mass)
        )
        xacc = temp - polemass_length * thetaacc * costheta / total_mass

        x = state.x + params.tau * state.x_dot
        x_dot = state.x_dot + params.tau * xacc
        theta = state.theta + params.tau * state.theta_dot
        theta_dot = state.theta_dot + params.tau * thetaacc
        t = state.t + 1
        new = CartPoleState(x, x_dot, theta, theta_dot, t)

        terminated = (
            (x < -params.x_threshold)
            | (x > params.x_threshold)
            | (theta < -params.theta_threshold)
            | (theta > params.theta_threshold)
        )
        truncated = (t >= params.max_steps) & ~terminated
        reward = jnp.float32(1.0)
        return self._obs(new), new, reward, terminated, truncated, {}


@struct.dataclass
class PendulumState:
    theta: jax.Array
    theta_dot: jax.Array
    t: jax.Array


@struct.dataclass
class PendulumParams:
    max_speed: float = 8.0
    max_torque: float = 2.0
    dt: float = 0.05
    g: float = 10.0
    m: float = 1.0
    l: float = 1.0
    max_steps: int = struct.field(pytree_node=False, default=200)


class Pendulum(Environment):
    """Pendulum-v1: Box(1) torque in [-2,2], shaped cost, 200-step truncation."""

    name = "Pendulum-v1"

    @property
    def default_params(self) -> PendulumParams:
        return PendulumParams()

    def observation_space(self, params) -> spaces.Box:
        high = jnp.array([1.0, 1.0, params.max_speed], jnp.float32)
        return spaces.Box(-high, high, (3,), jnp.float32)

    def action_space(self, params) -> spaces.Box:
        return spaces.Box(-params.max_torque, params.max_torque, (1,), jnp.float32)

    def reset_env(self, key, params):
        k1, k2 = jax.random.split(key)
        theta = jax.random.uniform(k1, (), jnp.float32, -jnp.pi, jnp.pi)
        theta_dot = jax.random.uniform(k2, (), jnp.float32, -1.0, 1.0)
        state = PendulumState(theta, theta_dot, jnp.int32(0))
        return self._obs(state), state

    def _obs(self, s: PendulumState) -> jax.Array:
        return jnp.stack(
            [jnp.cos(s.theta), jnp.sin(s.theta), s.theta_dot]
        ).astype(jnp.float32)

    def step_env(self, key, state, action, params):
        u = jnp.clip(action.reshape(()), -params.max_torque, params.max_torque)
        theta_norm = ((state.theta + jnp.pi) % (2 * jnp.pi)) - jnp.pi
        cost = theta_norm**2 + 0.1 * state.theta_dot**2 + 0.001 * u**2

        new_theta_dot = (
            state.theta_dot
            + (
                3.0 * params.g / (2.0 * params.l) * jnp.sin(state.theta)
                + 3.0 / (params.m * params.l**2) * u
            )
            * params.dt
        )
        new_theta_dot = jnp.clip(new_theta_dot, -params.max_speed, params.max_speed)
        new_theta = state.theta + new_theta_dot * params.dt
        t = state.t + 1
        new = PendulumState(new_theta, new_theta_dot, t)
        truncated = t >= params.max_steps
        return (
            self._obs(new),
            new,
            -cost.astype(jnp.float32),
            jnp.bool_(False),
            truncated,
            {},
        )


@struct.dataclass
class MountainCarState:
    position: jax.Array
    velocity: jax.Array
    t: jax.Array


@struct.dataclass
class MountainCarParams:
    min_position: float = -1.2
    max_position: float = 0.6
    max_speed: float = 0.07
    goal_position: float = 0.5
    goal_velocity: float = 0.0
    force: float = 0.001
    gravity: float = 0.0025
    max_steps: int = struct.field(pytree_node=False, default=200)


class MountainCar(Environment):
    """MountainCar-v0: discrete(3), -1/step, 200-step limit."""

    name = "MountainCar-v0"

    @property
    def default_params(self) -> MountainCarParams:
        return MountainCarParams()

    def observation_space(self, params) -> spaces.Box:
        low = jnp.array([params.min_position, -params.max_speed], jnp.float32)
        high = jnp.array([params.max_position, params.max_speed], jnp.float32)
        return spaces.Box(low, high, (2,), jnp.float32)

    def action_space(self, params) -> spaces.Discrete:
        return spaces.Discrete(3)

    def reset_env(self, key, params):
        pos = jax.random.uniform(key, (), jnp.float32, -0.6, -0.4)
        state = MountainCarState(pos, jnp.float32(0.0), jnp.int32(0))
        return self._obs(state), state

    def _obs(self, s) -> jax.Array:
        return jnp.stack([s.position, s.velocity]).astype(jnp.float32)

    def step_env(self, key, state, action, params):
        velocity = state.velocity + (action - 1) * params.force + jnp.cos(
            3 * state.position
        ) * (-params.gravity)
        velocity = jnp.clip(velocity, -params.max_speed, params.max_speed)
        position = jnp.clip(
            state.position + velocity, params.min_position, params.max_position
        )
        velocity = jnp.where(
            (position <= params.min_position) & (velocity < 0), 0.0, velocity
        )
        t = state.t + 1
        new = MountainCarState(position, velocity.astype(jnp.float32), t)
        terminated = (position >= params.goal_position) & (
            velocity >= params.goal_velocity
        )
        truncated = (t >= params.max_steps) & ~terminated
        return self._obs(new), new, jnp.float32(-1.0), terminated, truncated, {}


class MountainCarContinuous(MountainCar):
    """MountainCarContinuous-v0: Box(1) action, shaped reward."""

    name = "MountainCarContinuous-v0"

    @property
    def default_params(self) -> MountainCarParams:
        return MountainCarParams(max_speed=0.07, force=0.0015, gravity=0.0025,
                                 goal_position=0.45, max_steps=999)

    def action_space(self, params) -> spaces.Box:
        return spaces.Box(-1.0, 1.0, (1,), jnp.float32)

    def step_env(self, key, state, action, params):
        force = jnp.clip(action.reshape(()), -1.0, 1.0)
        velocity = state.velocity + force * params.force + jnp.cos(
            3 * state.position
        ) * (-params.gravity)
        velocity = jnp.clip(velocity, -params.max_speed, params.max_speed)
        position = jnp.clip(
            state.position + velocity, params.min_position, params.max_position
        )
        velocity = jnp.where(
            (position <= params.min_position) & (velocity < 0), 0.0, velocity
        )
        t = state.t + 1
        new = MountainCarState(position, velocity.astype(jnp.float32), t)
        terminated = (position >= params.goal_position) & (
            velocity >= params.goal_velocity
        )
        truncated = (t >= params.max_steps) & ~terminated
        reward = jnp.where(terminated, 100.0, 0.0) - 0.1 * force**2
        return (
            self._obs(new),
            new,
            reward.astype(jnp.float32),
            terminated,
            truncated,
            {},
        )


@struct.dataclass
class AcrobotState:
    theta1: jax.Array
    theta2: jax.Array
    dtheta1: jax.Array
    dtheta2: jax.Array
    t: jax.Array


@struct.dataclass
class AcrobotParams:
    dt: float = 0.2
    link_length_1: float = 1.0
    link_length_2: float = 1.0
    link_mass_1: float = 1.0
    link_mass_2: float = 1.0
    link_com_pos_1: float = 0.5
    link_com_pos_2: float = 0.5
    link_moi: float = 1.0
    max_vel_1: float = 4 * jnp.pi
    max_vel_2: float = 9 * jnp.pi
    max_steps: int = struct.field(pytree_node=False, default=500)


class Acrobot(Environment):
    """Acrobot-v1: discrete(3) torque {-1,0,1}, -1/step until swing-up."""

    name = "Acrobot-v1"

    @property
    def default_params(self) -> AcrobotParams:
        return AcrobotParams()

    def observation_space(self, params) -> spaces.Box:
        high = jnp.array(
            [1.0, 1.0, 1.0, 1.0, params.max_vel_1, params.max_vel_2], jnp.float32
        )
        return spaces.Box(-high, high, (6,), jnp.float32)

    def action_space(self, params) -> spaces.Discrete:
        return spaces.Discrete(3)

    def reset_env(self, key, params):
        init = jax.random.uniform(key, (4,), jnp.float32, -0.1, 0.1)
        state = AcrobotState(init[0], init[1], init[2], init[3], jnp.int32(0))
        return self._obs(state), state

    def _obs(self, s) -> jax.Array:
        return jnp.stack(
            [
                jnp.cos(s.theta1),
                jnp.sin(s.theta1),
                jnp.cos(s.theta2),
                jnp.sin(s.theta2),
                s.dtheta1,
                s.dtheta2,
            ]
        ).astype(jnp.float32)

    def _dsdt(self, s_aug, params):
        m1, m2 = params.link_mass_1, params.link_mass_2
        l1 = params.link_length_1
        lc1, lc2 = params.link_com_pos_1, params.link_com_pos_2
        i1 = i2 = params.link_moi
        g = 9.8
        theta1, theta2, dtheta1, dtheta2, a = (
            s_aug[0],
            s_aug[1],
            s_aug[2],
            s_aug[3],
            s_aug[4],
        )
        d1 = (
            m1 * lc1**2
            + m2 * (l1**2 + lc2**2 + 2 * l1 * lc2 * jnp.cos(theta2))
            + i1
            + i2
        )
        d2 = m2 * (lc2**2 + l1 * lc2 * jnp.cos(theta2)) + i2
        phi2 = m2 * lc2 * g * jnp.cos(theta1 + theta2 - jnp.pi / 2.0)
        phi1 = (
            -m2 * l1 * lc2 * dtheta2**2 * jnp.sin(theta2)
            - 2 * m2 * l1 * lc2 * dtheta2 * dtheta1 * jnp.sin(theta2)
            + (m1 * lc1 + m2 * l1) * g * jnp.cos(theta1 - jnp.pi / 2)
            + phi2
        )
        ddtheta2 = (
            a
            + d2 / d1 * phi1
            - m2 * l1 * lc2 * dtheta1**2 * jnp.sin(theta2)
            - phi2
        ) / (m2 * lc2**2 + i2 - d2**2 / d1)
        ddtheta1 = -(d2 * ddtheta2 + phi1) / d1
        return jnp.stack([dtheta1, dtheta2, ddtheta1, ddtheta2, jnp.zeros_like(a)])

    def step_env(self, key, state, action, params):
        torque = (action - 1).astype(jnp.float32)
        s_aug = jnp.stack(
            [state.theta1, state.theta2, state.dtheta1, state.dtheta2, torque]
        )
        # RK4 over one dt, matching Gymnasium's integrator.
        dt = params.dt
        k1 = self._dsdt(s_aug, params)
        k2 = self._dsdt(s_aug + dt / 2 * k1, params)
        k3 = self._dsdt(s_aug + dt / 2 * k2, params)
        k4 = self._dsdt(s_aug + dt * k3, params)
        ns = s_aug + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)

        wrap = lambda x: ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi
        theta1 = wrap(ns[0])
        theta2 = wrap(ns[1])
        dtheta1 = jnp.clip(ns[2], -params.max_vel_1, params.max_vel_1)
        dtheta2 = jnp.clip(ns[3], -params.max_vel_2, params.max_vel_2)
        t = state.t + 1
        new = AcrobotState(theta1, theta2, dtheta1, dtheta2, t)
        terminated = -jnp.cos(theta1) - jnp.cos(theta2 + theta1) > 1.0
        truncated = (t >= params.max_steps) & ~terminated
        reward = jnp.where(terminated, 0.0, -1.0).astype(jnp.float32)
        return self._obs(new), new, reward, terminated, truncated, {}
