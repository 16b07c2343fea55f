"""Shared cadence matrix: Trainer, AsyncTrainer, and HostEnvTrainer honor
the SAME periodic-save / param-stats / eval / flush cadences (VERDICT r3
next #5; ≙ the reference's post_process cadences,
border-core/src/trainer.rs:231-264 and periodic saves :259-261), and the
HostEnvTrainer restores its cadence counters across a mid-run kill."""

import os

import jax
import numpy as np
import pytest

from border_tpu.agents import DQN, DQNConfig
from border_tpu.envs import make
from border_tpu.record import BufferedRecorder
from border_tpu.replay import ReplayBuffer
from border_tpu.train import (
    AsyncTrainer, Evaluator, HostEnvTrainer, Trainer, TrainerConfig,
)

CFG = dict(max_opts=24, warmup_period=0, opt_interval=8, batch_size=32,
           num_envs=8, steps_per_chunk=8, eval_interval=8, save_interval=8,
           record_agent_info_interval=8, flush_record_interval=8, seed=3)


def _build(kind, recorder, cfg):
    agent = DQN(DQNConfig(hidden=(8,)))
    buffer = ReplayBuffer(512)
    if kind == "host":
        return HostEnvTrainer("CartPole-v1", agent, buffer, cfg,
                              recorder=recorder,
                              evaluator=None if cfg.eval_interval >= 10**9
                              else _host_eval())
    env = make("CartPole-v1")
    cls = {"trainer": Trainer, "async": AsyncTrainer}[kind]
    ev = None if cfg.eval_interval >= 10**9 else Evaluator(env, 2, 50)
    return cls(env, agent, buffer, cfg, recorder=recorder, evaluator=ev)


def _host_eval():
    from border_tpu.train import HostEvaluator

    return HostEvaluator("CartPole-v1", n_episodes=2, max_steps=50)


@pytest.mark.parametrize("kind", ["trainer", "async", "host"])
def test_cadence_matrix(kind, tmp_path):
    """Every trainer: periodic model saves land in model_dir at
    save_interval, param/ stats records appear at
    record_agent_info_interval, and evaluations run at eval_interval."""
    rec = BufferedRecorder(model_dir=str(tmp_path / "m"))
    cfg = TrainerConfig(**CFG)
    tr = _build(kind, rec, cfg)
    res = tr.train()
    if kind == "host":
        tr.env.close()
    assert res.opt_steps >= cfg.max_opts

    # periodic saves: at least two numbered save dirs within the run,
    # each loadable
    saves = sorted(int(d) for d in os.listdir(rec.model_dir) if d.isdigit())
    assert len(saves) >= 2, saves
    assert all(s >= cfg.save_interval for s in saves)
    agent = tr.agent
    restored = agent.load(res.agent_state,
                          os.path.join(rec.model_dir, str(saves[-1])))
    assert jax.tree.leaves(restored)

    # param-stat records (≙ param_stats, border-tch-agent/src/util.rs:66-80)
    keys = {k for r in rec.records for k, _ in r}
    assert any(k.startswith("param/") for k in keys), sorted(keys)[:20]

    # evaluations ran and best-model selection saved "best"
    assert len(res.eval_history) >= 2
    assert os.path.isdir(os.path.join(rec.model_dir, "best"))


def test_host_trainer_midkill_resume_cadences(tmp_path):
    """A HostEnvTrainer killed mid-run resumes with its cadence counters
    (next_save, update_debt) restored: the resumed process re-saves only
    FUTURE periodic checkpoints, never re-emitting pre-kill ones."""
    from border_tpu.utils import CheckpointManager

    base = dict(CFG)
    base.update(eval_interval=10**9, record_agent_info_interval=0)

    # run 1: "killed" at max_opts=12 (past the save at 8, before 16)
    cfg1 = TrainerConfig(**{**base, "max_opts": 12})
    rec1 = BufferedRecorder(model_dir=str(tmp_path / "m1"))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=3)
    t1 = HostEnvTrainer("CartPole-v1", DQN(DQNConfig(hidden=(8,))),
                        ReplayBuffer(512), cfg1, recorder=rec1,
                        checkpoint_manager=mgr, checkpoint_interval=4)
    res1 = t1.train()
    t1.env.close()
    saves1 = sorted(int(d) for d in os.listdir(rec1.model_dir) if d.isdigit())
    assert saves1 and min(saves1) >= 8, saves1
    assert mgr.latest_step() is not None

    # run 2: resume from the latest checkpoint, run to 24
    cfg2 = TrainerConfig(**{**base, "max_opts": 24})
    rec2 = BufferedRecorder(model_dir=str(tmp_path / "m2"))
    t2 = HostEnvTrainer("CartPole-v1", DQN(DQNConfig(hidden=(8,))),
                        ReplayBuffer(512), cfg2, recorder=rec2)
    res2 = t2.train(resume_from=mgr)
    t2.env.close()
    mgr.close()

    assert res2.opt_steps >= 24
    saves2 = sorted(int(d) for d in os.listdir(rec2.model_dir) if d.isdigit())
    # next_save was restored: no re-save at or below the pre-kill cadence
    # point, and the future cadence fired
    assert saves2, "no periodic saves after resume"
    assert min(saves2) > max(saves1), (saves1, saves2)


def test_reconcile_next_cadence():
    """Resume-time cadence reconciliation (code-review r4): disabling
    save_interval disables saves regardless of history; enabling it after
    a no-save run schedules from the current position; a stale counter
    can never fall behind opt_steps (which would fire every iteration)."""
    from border_tpu.train.trainer import _reconcile_next_cadence as rec

    assert rec(16, 0, 20) is None          # disabled now → None
    assert rec(-1, 8, 20) == 28            # was disabled → schedule ahead
    assert rec(16, 8, 12) == 16            # normal continuation
    # stale counter far behind opt_steps advances to the current boundary
    assert rec(8, 8, 100) == 96


def test_host_trainer_resumes_legacy_checkpoint(tmp_path):
    """A checkpoint written WITHOUT the r4 cadence keys (pre-change
    layout) still resumes: the restore falls back to the legacy extra
    template and defaults the new counters (code-review r4 #1)."""
    import jax

    from border_tpu.utils import CheckpointManager

    base = dict(CFG)
    base.update(eval_interval=10**9, record_agent_info_interval=0,
                save_interval=0)
    cfg1 = TrainerConfig(**{**base, "max_opts": 12})
    t1 = HostEnvTrainer("CartPole-v1", DQN(DQNConfig(hidden=(8,))),
                        ReplayBuffer(512), cfg1)
    # run briefly, then write a LEGACY-layout checkpoint by hand
    res1 = t1.train()
    t1.env.close()
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=1)
    mgr.save(res1.opt_steps, res1.agent_state, res1.buffer_state,
             key=jax.random.PRNGKey(0),
             extra={"env_steps": res1.env_steps,
                    "opt_steps": res1.opt_steps,
                    "best_score": 0.0, "next_eval": 10**9,
                    "next_flush": 8, "next_ckpt": 0,
                    "update_debt": 0.0})

    cfg2 = TrainerConfig(**{**base, "max_opts": 24, "save_interval": 8})
    rec2 = BufferedRecorder(model_dir=str(tmp_path / "m2"))
    t2 = HostEnvTrainer("CartPole-v1", DQN(DQNConfig(hidden=(8,))),
                        ReplayBuffer(512), cfg2, recorder=rec2)
    res2 = t2.train(resume_from=mgr)
    t2.env.close()
    mgr.close()
    assert res2.opt_steps >= 24
    # newly-enabled periodic saves fired (scheduled from the resume point)
    saves = [d for d in os.listdir(rec2.model_dir) if d.isdigit()]
    assert saves, "save_interval enabled on resume produced no saves"
