"""Dict-obs goal env + flatten wrapper (FetchReach-style capability)."""

import jax
import jax.numpy as jnp
import numpy as np

from border_tpu.agents import SAC, SACConfig
from border_tpu.core.env import VecEnv
from border_tpu.envs import make
from border_tpu.replay import ReplayBuffer
from border_tpu.train import Evaluator, Trainer, TrainerConfig


def test_dict_obs_shapes():
    env = make("Reacher-v0")
    params = env.default_params
    obs, state = env.reset_env(jax.random.PRNGKey(0), params)
    assert set(obs) == {"observation", "achieved_goal", "desired_goal"}
    assert obs["observation"].shape == (4,)
    assert obs["desired_goal"].shape == (2,)
    act = env.action_space(params).sample(jax.random.PRNGKey(1))
    obs2, state, r, term, trunc, _ = env.step_env(
        jax.random.PRNGKey(2), state, act, params
    )
    assert float(r) <= 1.0


def test_dict_obs_through_vec_env_and_replay():
    """Dict observations flow through VecEnv + the generic replay buffer."""
    from border_tpu.replay import Transition

    env = make("Reacher-v0")
    vec = VecEnv(env, 4)
    state = vec.reset(jax.random.PRNGKey(0))
    assert isinstance(state.obs, dict)

    buf = ReplayBuffer(capacity=64)
    obs0 = vec.observation_space.zero()
    example = Transition(
        obs=obs0, act=vec.action_space.zero(), next_obs=obs0,
        reward=jnp.float32(0), terminated=jnp.bool_(False), truncated=jnp.bool_(False),
    )
    bstate = buf.init(example)
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        key, k = jax.random.split(key)
        acts = jax.vmap(vec.action_space.sample)(jax.random.split(k, 4))
        prev_obs, prev_len = state.obs, state.episode_length
        ts, state = vec.step(state, acts)
        bstate = buf.process_step(bstate, prev_obs, acts, ts, prev_len)
    batch = buf.sample(bstate, key, 8)
    assert batch.obs["observation"].shape == (8, 4)
    assert batch.next_obs["desired_goal"].shape == (8, 2)


def test_flatten_wrapper_and_sac_trains():
    env = make("ReacherFlat-v0")
    vec = VecEnv(env, 4)
    state = vec.reset(jax.random.PRNGKey(0))
    assert state.obs.shape == (4, 8)  # 4 + 2 + 2

    agent = SAC(SACConfig(actor_hidden=(16,), critic_hidden=(16,)))
    cfg = TrainerConfig(
        max_opts=10, warmup_period=64, opt_interval=16, batch_size=32,
        num_envs=8, steps_per_chunk=8, eval_interval=8, eval_episodes=2,
    )
    ev = Evaluator(env, n_episodes=2, max_steps=50)
    res = Trainer(env, agent, ReplayBuffer(512), cfg, evaluator=ev).train()
    assert res.opt_steps >= 10
    assert np.isfinite(res.best_score)
