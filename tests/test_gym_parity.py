"""Dynamics parity: pure-JAX envs vs canonical Gymnasium, step by step.

This is the learning-curve-parity foundation (SURVEY.md §7 hard parts):
if per-step dynamics, rewards, and termination flags match exactly, return
curves are comparable by construction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

gym = pytest.importorskip("gymnasium")

from border_tpu.envs import make


def _sync_state(gym_env, jax_env, jax_state):
    """Force the gym env's internal state to match the JAX state."""
    name = jax_env.name
    u = gym_env.unwrapped
    if name == "CartPole-v1":
        u.state = np.array(
            [jax_state.x, jax_state.x_dot, jax_state.theta, jax_state.theta_dot],
            dtype=np.float64,
        )
    elif name == "Pendulum-v1":
        u.state = np.array([jax_state.theta, jax_state.theta_dot], np.float64)
    elif name == "MountainCar-v0":
        u.state = np.array([jax_state.position, jax_state.velocity], np.float64)
    elif name == "Acrobot-v1":
        u.state = np.array(
            [jax_state.theta1, jax_state.theta2, jax_state.dtheta1, jax_state.dtheta2],
            np.float64,
        )


@pytest.mark.parametrize(
    "name,discrete,steps,tol",
    [
        ("CartPole-v1", True, 60, 1e-4),
        ("Pendulum-v1", False, 60, 1e-3),
        ("MountainCar-v0", True, 60, 1e-5),
        ("Acrobot-v1", True, 30, 1e-3),
    ],
)
def test_stepwise_dynamics_match_gymnasium(name, discrete, steps, tol):
    jax_env = make(name)
    params = jax_env.default_params
    gym_env = gym.make(name)
    gym_env.reset(seed=0)

    key = jax.random.PRNGKey(0)
    _, state = jax_env.reset_env(key, params)
    _sync_state(gym_env, jax_env, state)

    rng = np.random.RandomState(0)
    for t in range(steps):
        if discrete:
            a = rng.randint(gym_env.action_space.n)
            a_jax = jnp.int32(a)
        else:
            a = rng.uniform(-2, 2, size=gym_env.action_space.shape).astype(np.float32)
            a_jax = jnp.asarray(a)
        obs_j, state, r_j, term_j, trunc_j, _ = jax_env.step_env(
            key, state, a_jax, params
        )
        obs_g, r_g, term_g, _, _ = gym_env.step(a)
        assert np.allclose(np.asarray(obs_j), obs_g, atol=tol), (
            f"{name} obs diverged at step {t}: {np.asarray(obs_j)} vs {obs_g}"
        )
        assert np.isclose(float(r_j), r_g, atol=tol), f"{name} reward at {t}"
        assert bool(term_j) == bool(term_g), f"{name} terminated at {t}"
        if bool(term_g):
            break
    gym_env.close()


def test_policy_cross_evaluation_on_gym():
    """A trained-in-JAX policy scores comparably on real Gymnasium."""
    from border_tpu.agents import DQN, DQNConfig
    from border_tpu.envs.gym_bridge import evaluate_policy_on_gym
    from border_tpu.replay import ReplayBuffer
    from border_tpu.train import Trainer, TrainerConfig, Evaluator

    # the gate cartpole config at reduced scale — the most seed-robust
    # DQN-CartPole recipe from the r3 stability sweep (n-step-3 backups,
    # periodic hard target updates)
    env = make("CartPole-v1")
    agent = DQN(DQNConfig(hidden=(64, 64), lr=5e-4, tau=1.0,
                          soft_update_interval=500, double_dqn=True,
                          eps_final_step=10_000))
    cfg = TrainerConfig(
        max_opts=6_000, warmup_period=500, opt_interval=16, batch_size=128,
        num_envs=64, steps_per_chunk=32, eval_interval=10**9, seed=1,
    )
    res = Trainer(env, agent,
                  ReplayBuffer(32_768, n_step=3, stride=64), cfg).train()

    ev = Evaluator(env, n_episodes=5, max_steps=500)
    jax_score, _ = ev.evaluate(agent, res.agent_state)

    key = jax.random.PRNGKey(0)
    gym_score = evaluate_policy_on_gym(
        "CartPole-v1",
        lambda obs: agent.select_action_eval(res.agent_state, jnp.asarray(obs), key),
        n_episodes=5,
        max_steps=500,
    )
    # trained-in-JAX policy must transfer to canonical Gymnasium dynamics
    assert jax_score > 60.0, f"policy failed to train (jax {jax_score})"
    assert gym_score > 60.0, f"policy did not transfer (gym {gym_score} vs jax {jax_score})"
