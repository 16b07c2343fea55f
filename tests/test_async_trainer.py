"""Decoupled actor-learner tests (≙ the async doctest,
border-async-trainer/src/lib.rs:1-137)."""

import jax
import numpy as np
import pytest

from border_tpu.agents import DQN, DQNConfig
from border_tpu.envs import make
from border_tpu.parallel import ShardedAsyncTrainer
from border_tpu.record import BufferedRecorder
from border_tpu.replay import ReplayBuffer
from border_tpu.train import AsyncTrainer, Evaluator, TrainerConfig

CFG = TrainerConfig(
    max_opts=30,
    warmup_period=64,
    opt_interval=16,
    batch_size=16,
    num_envs=8,
    steps_per_chunk=8,
    eval_interval=20,
    eval_episodes=2,
    sync_interval=10,
    flush_record_interval=10,
)


def test_async_trainer_runs_and_syncs():
    env = make("CartPole-v1")
    agent = DQN(DQNConfig(hidden=(8,)))
    rec = BufferedRecorder()
    ev = Evaluator(env, n_episodes=2, max_steps=50)
    tr = AsyncTrainer(env, agent, ReplayBuffer(512), CFG, recorder=rec, evaluator=ev)
    res = tr.train()
    assert res.opt_steps >= 30
    assert res.env_steps > 0
    assert len(res.eval_history) >= 1
    # AsyncTrainStat-style throughput records were emitted
    keys = set()
    for r in rec.records:
        keys.update(k for k, _ in r)
    assert any("samples_per_sec" in k for k in keys)
    assert any("opt_steps_per_sec" in k for k in keys)


@pytest.mark.skipif(jax.device_count() < 2, reason="needs multiple devices")
def test_sharded_async_trainer():
    n = jax.device_count()
    env = make("CartPole-v1")
    agent = DQN(DQNConfig(hidden=(8,)))
    cfg = CFG.replace(num_envs=2 * n, batch_size=2 * n, max_opts=8, warmup_period=0)
    tr = ShardedAsyncTrainer(env, agent, ReplayBuffer(128), cfg)
    res = tr.train()
    assert res.opt_steps >= 8
