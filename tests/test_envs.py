"""Env contract tests (≙ reference integration-test style, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from border_tpu.core.env import VecEnv
from border_tpu.envs import make, registry

CLASSIC = [
    "CartPole-v1",
    "Pendulum-v1",
    "MountainCar-v0",
    "MountainCarContinuous-v0",
    "Acrobot-v1",
]


@pytest.mark.parametrize("name", CLASSIC)
def test_reset_step_shapes(name):
    env = make(name)
    params = env.default_params
    key = jax.random.PRNGKey(0)
    obs, state = env.reset_env(key, params)
    assert obs.shape == env.observation_space(params).shape
    act = env.action_space(params).sample(key)
    obs2, state2, r, term, trunc, info = env.step_env(key, state, act, params)
    assert obs2.shape == obs.shape
    assert r.dtype == jnp.float32
    assert term.dtype == jnp.bool_ and trunc.dtype == jnp.bool_


@pytest.mark.parametrize("name", CLASSIC)
def test_vec_env_rollout(name):
    env = make(name)
    vec = VecEnv(env, num_envs=16)
    state = vec.reset(jax.random.PRNGKey(0))

    def body(state, key):
        acts = jax.vmap(vec.action_space.sample)(jax.random.split(key, 16))
        ts, state = vec.step(state, acts)
        return state, ts.reward

    keys = jax.random.split(jax.random.PRNGKey(1), 50)
    state, rewards = jax.lax.scan(body, state, keys)
    assert rewards.shape == (50, 16)
    assert np.isfinite(np.asarray(rewards)).all()


def test_cartpole_autoreset_restores_episode():
    """Force a terminal state and verify the auto-reset path re-seeds the
    episode and final_obs keeps the pre-reset observation
    (≙ step_with_reset init_obs semantics, border-core/src/base/env.rs:138-160)."""
    env = make("CartPole-v1")
    vec = VecEnv(env, num_envs=4)
    state = vec.reset(jax.random.PRNGKey(0))
    # Push the cart right until termination.
    done_seen = False
    for i in range(300):
        ts, state = vec.step(state, jnp.ones((4,), jnp.int32))
        if bool(ts.done.any()):
            done_seen = True
            done = np.asarray(ts.done)
            final = np.asarray(ts.final_obs)[done]
            fresh = np.asarray(ts.obs)[done]
            # terminal obs is out of bounds; reset obs is within ±0.05
            assert (np.abs(final).max(axis=-1) > 0.2).all()
            assert (np.abs(fresh) <= 0.05 + 1e-6).all()
            # episode stats latched
            assert (np.asarray(state.last_length)[done] > 0).all()
            break
    assert done_seen


def test_pendulum_truncates_at_200():
    env = make("Pendulum-v1")
    vec = VecEnv(env, num_envs=2)
    state = vec.reset(jax.random.PRNGKey(0))
    for i in range(200):
        ts, state = vec.step(state, jnp.zeros((2, 1), jnp.float32))
    assert bool(ts.truncated.all())
    assert not bool(ts.terminated.any())
    assert (np.asarray(state.last_length) == 200).all()


def test_registry_contents():
    for name in CLASSIC:
        assert name in registry


def test_reset_with_index_deterministic():
    env = make("CartPole-v1")
    vec = VecEnv(env, num_envs=3)
    key = jax.random.PRNGKey(42)
    s1 = vec.reset_with_index(key, 7)
    s2 = vec.reset_with_index(key, 7)
    s3 = vec.reset_with_index(key, 8)
    assert np.allclose(np.asarray(s1.obs), np.asarray(s2.obs))
    assert not np.allclose(np.asarray(s1.obs), np.asarray(s3.obs))
