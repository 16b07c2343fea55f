"""HostEnvTrainer: C++ envpool → device learner end-to-end
(≙ the reference's host-ALE + actor-thread + GPU-learner architecture,
border-atari-env/src/atari_env/ale.rs:62-100 + actor/base.rs:120-178)."""

import numpy as np
import pytest

from border_tpu.envs.native import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="cpp toolchain unavailable"
)


def test_step_final_exposes_pre_reset_obs():
    from border_tpu.envs.native import NativeVecEnv

    env = NativeVecEnv("CartPole-v1", 32, seed=3)
    env.reset()
    rng = np.random.RandomState(0)
    saw_done = False
    for _ in range(300):
        obs, final_obs, rew, term, trunc = env.step_final(
            rng.randint(0, 2, size=32)
        )
        done = term | trunc
        if done.any():
            saw_done = True
            # post-reset obs differs from the final obs at boundaries
            assert not np.allclose(obs[done], final_obs[done])
            # a terminated CartPole final obs is out of bounds; the reset
            # obs is inside the init envelope
            assert (np.abs(obs[done]) <= 0.05 + 1e-6).all()
        assert np.allclose(obs[~done], final_obs[~done])
    assert saw_done
    env.close()


def test_host_env_trainer_learns_cartpole():
    from border_tpu.agents import DQN, DQNConfig
    from border_tpu.record import BufferedRecorder
    from border_tpu.replay import ReplayBuffer
    from border_tpu.train import HostEnvTrainer, HostEvaluator, TrainerConfig

    agent = DQN(DQNConfig(hidden=(64, 64), lr=1e-3, tau=0.01,
                          soft_update_interval=1, double_dqn=True,
                          eps_final_step=20_000))
    cfg = TrainerConfig(
        max_opts=1_500, warmup_period=500, opt_interval=16, batch_size=64,
        num_envs=32, steps_per_chunk=8, eval_interval=500, seed=0,
    )
    recorder = BufferedRecorder()
    tr = HostEnvTrainer(
        "CartPole-v1", agent, ReplayBuffer(16_384), cfg, recorder=recorder,
        evaluator=HostEvaluator("CartPole-v1", n_episodes=5, max_steps=500),
    )
    res = tr.train()
    assert res.opt_steps >= cfg.max_opts
    assert res.eval_history, "no evaluations ran"
    best = max(s for _, s in res.eval_history)
    assert best > 100.0, f"native-env training did not learn: {res.eval_history}"
    # overlap instrumentation present: host env time is measured and the
    # double-buffered pipeline keeps the device from idling on the host
    waits = [
        r.get_scalar(k)
        for r in recorder.records
        for k, _ in r
        if k.startswith("host_wait_frac")
    ]
    assert waits, "host_wait_frac record missing"
    assert min(waits) < 0.9
