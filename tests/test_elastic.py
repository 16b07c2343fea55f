"""Elastic crash-recovery tests (SURVEY §5.3 — the reference loses actors
silently and has no restart; here a crash resumes from the latest
full-state checkpoint)."""

import jax
import numpy as np
import pytest

from border_tpu.agents import DQN, DQNConfig
from border_tpu.envs import make
from border_tpu.replay import ReplayBuffer
from border_tpu.train import Trainer, TrainerConfig, TrainingFailed, run_elastic

CFG = TrainerConfig(
    max_opts=24,
    warmup_period=0,
    opt_interval=8,
    batch_size=16,
    num_envs=8,
    steps_per_chunk=8,
    eval_interval=10**9,
    seed=3,
)


class _CrashingTrainer(Trainer):
    """Injects one fault after the first post-checkpoint chunk."""

    crashes_left = 1

    def _chunk(self, *args, **kwargs):
        out = super()._chunk(*args, **kwargs)
        if (
            type(self).crashes_left > 0
            and getattr(self, "_next_ckpt", 0) > self.checkpoint_interval
        ):
            type(self).crashes_left -= 1
            raise RuntimeError("injected fault: actor died")
        return out


def test_elastic_recovers_from_injected_crash(tmp_path):
    _CrashingTrainer.crashes_left = 1
    attempts = []

    def make_trainer(mgr):
        attempts.append(mgr.latest_step())
        env = make("CartPole-v1")
        return _CrashingTrainer(
            env, DQN(DQNConfig(hidden=(8,))), ReplayBuffer(256), CFG,
            checkpoint_manager=mgr, checkpoint_interval=8,
        )

    res = run_elastic(make_trainer, str(tmp_path / "ckpt"), max_restarts=2)
    assert res.opt_steps >= CFG.max_opts
    # first attempt started cold, the retry resumed from a real checkpoint
    assert attempts[0] is None
    assert len(attempts) == 2 and attempts[1] is not None
    assert np.isfinite(
        np.asarray(jax.tree.leaves(res.agent_state.params)[0])
    ).all()


def test_elastic_gives_up_after_max_restarts(tmp_path):
    def make_trainer(mgr):
        class AlwaysCrash(Trainer):
            def _chunk(self, *a, **k):
                raise RuntimeError("hard fault")

        env = make("CartPole-v1")
        return AlwaysCrash(
            env, DQN(DQNConfig(hidden=(8,))), ReplayBuffer(256), CFG,
            checkpoint_manager=mgr, checkpoint_interval=8,
        )

    with pytest.raises(TrainingFailed):
        run_elastic(make_trainer, str(tmp_path / "ckpt"), max_restarts=1)
