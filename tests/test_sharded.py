"""Sharded actor-learner tests on the virtual 8-device CPU mesh
(≙ the reference's threads-in-one-process async doctest,
border-async-trainer/src/lib.rs:1-137)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from border_tpu.agents import DQN, DQNConfig, SAC, SACConfig
from border_tpu.envs import make
from border_tpu.parallel import ShardedTrainer, make_mesh
from border_tpu.replay import PerConfig, ReplayBuffer
from border_tpu.train import TrainerConfig

pytestmark = pytest.mark.skipif(
    jax.device_count() < 2, reason="needs multiple (virtual) devices"
)


def _cfg(n_dev):
    return TrainerConfig(
        num_envs=2 * n_dev,
        steps_per_chunk=4,
        batch_size=2 * n_dev,
        opt_interval=8,
        warmup_period=0,
        max_opts=4,
        eval_interval=10**9,
    )


def test_sharded_chunk_runs_and_params_replicated():
    n = jax.device_count()
    mesh = make_mesh(("actors",))
    env = make("CartPole-v1")
    agent = DQN(DQNConfig(hidden=(8,)))
    tr = ShardedTrainer(env, agent, ReplayBuffer(128), _cfg(n), mesh=mesh)
    k = jax.random.PRNGKey(0)
    agent_state, vec_state, buf_state = tr.init_states(k, k)
    out = tr._chunk(agent_state, vec_state, buf_state, k, True)
    agent_state2 = out[0]
    assert int(agent_state2.n_opts) > 0
    # replicated output: same value regardless of which device we read
    p = jax.tree.leaves(agent_state2.params)[0]
    assert np.isfinite(np.asarray(p)).all()
    # per-device buffers each got steps_per_chunk * local_envs transitions
    sizes = np.asarray(out[2].size)
    assert sizes.shape == (n,)
    assert (sizes == 4 * tr.local_envs).all()


def test_sharded_full_train_loop():
    n = jax.device_count()
    env = make("CartPole-v1")
    agent = DQN(DQNConfig(hidden=(8,)))
    tr = ShardedTrainer(env, agent, ReplayBuffer(128, per=PerConfig()), _cfg(n))
    res = tr.train()
    assert res.opt_steps >= 4
    assert res.env_steps > 0


def test_sharded_sac():
    n = jax.device_count()
    env = make("Pendulum-v1")
    agent = SAC(SACConfig(actor_hidden=(8,), critic_hidden=(8,)))
    tr = ShardedTrainer(env, agent, ReplayBuffer(128), _cfg(n))
    res = tr.train()
    assert res.opt_steps >= 4


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 6)
    ge.dryrun_multichip(jax.device_count())
