"""Trainer end-to-end tests — the reference's integration-test style
(miniature training runs, ~100 opt steps; SURVEY.md §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np

from border_tpu.agents import BC, BCConfig, DQN, DQNConfig, SAC, SACConfig
from border_tpu.data import OfflineDataset, collect_dataset
from border_tpu.envs import make
from border_tpu.record import BufferedRecorder
from border_tpu.replay import PerConfig, ReplayBuffer
from border_tpu.train import Evaluator, OfflineTrainer, Trainer, TrainerConfig

SMALL = TrainerConfig(
    max_opts=20,
    warmup_period=64,
    opt_interval=32,
    batch_size=32,
    num_envs=8,
    steps_per_chunk=8,
    eval_interval=10,
    eval_episodes=2,
    flush_record_interval=10,
)


def test_dqn_cartpole_miniature(tmp_path):
    env = make("CartPole-v1")
    agent = DQN(DQNConfig(hidden=(16,)))
    rec = BufferedRecorder(model_dir=str(tmp_path))
    ev = Evaluator(env, n_episodes=2, max_steps=100)
    tr = Trainer(env, agent, ReplayBuffer(1024), SMALL, recorder=rec, evaluator=ev)
    res = tr.train()
    assert res.opt_steps >= 20
    assert res.env_steps > 0
    assert len(res.eval_history) >= 1
    assert np.isfinite(res.best_score)
    # best model was saved through the recorder (trainer.rs:251-255 analogue)
    assert (tmp_path / "best" / "dqn.npz").exists()
    # telemetry flowed
    assert any("loss_mean" in r or "loss" in r for r in rec.records)


def test_sac_pendulum_miniature():
    env = make("Pendulum-v1")
    agent = SAC(SACConfig(actor_hidden=(16,), critic_hidden=(16,)))
    ev = Evaluator(env, n_episodes=2, max_steps=100)
    tr = Trainer(env, agent, ReplayBuffer(1024), SMALL, evaluator=ev)
    res = tr.train()
    assert res.opt_steps >= 20
    assert np.isfinite(res.best_score)


def test_dqn_per_miniature():
    env = make("CartPole-v1")
    agent = DQN(DQNConfig(hidden=(16,)))
    tr = Trainer(env, agent, ReplayBuffer(1024, per=PerConfig()), SMALL)
    res = tr.train()
    assert res.opt_steps >= 20


def test_offline_bc_on_collected_dataset():
    env = make("Pendulum-v1")
    sac = SAC(SACConfig(actor_hidden=(8,), critic_hidden=(8,)))
    key = jax.random.PRNGKey(0)
    from border_tpu.core.env import VecEnv

    vec = VecEnv(env, 4)
    sac_state = sac.init(key, vec.observation_space, vec.action_space)
    ds = collect_dataset(env, sac, sac_state, n_steps=512, num_envs=8)
    assert len(ds) == 512

    buffer = ReplayBuffer(1024)
    buf_state = ds.to_replay_buffer(buffer)
    assert int(buf_state.size) == 512

    bc = BC(BCConfig(hidden=(16,)))
    bc_state = bc.init(key, vec.observation_space, vec.action_space)
    cfg = SMALL.replace(max_opts=30)
    ev = Evaluator(env, n_episodes=2, max_steps=50)
    tr = OfflineTrainer(bc, buffer, cfg, evaluator=ev, updates_per_chunk=10)
    res = tr.train(bc_state, buf_state)
    assert res.opt_steps >= 30
    assert len(res.eval_history) >= 1


def test_dataset_npz_roundtrip(tmp_path):
    eps = [
        {"obs": np.random.randn(11, 3).astype(np.float32),
         "act": np.random.randn(10, 1).astype(np.float32),
         "reward": np.random.randn(10).astype(np.float32),
         "terminated": True},
        {"obs": np.random.randn(6, 3).astype(np.float32),
         "act": np.random.randn(5, 1).astype(np.float32),
         "reward": np.random.randn(5).astype(np.float32),
         "terminated": False},
    ]
    ds = OfflineDataset.from_episodes(eps)
    assert len(ds) == 15
    assert ds.terminated[9] and not ds.terminated[14]
    assert ds.truncated[14]
    p = str(tmp_path / "ds.npz")
    ds.save_npz(p)
    ds2 = OfflineDataset.from_npz(p)
    assert np.allclose(ds.obs, ds2.obs)


def test_trainer_config_yaml_roundtrip(tmp_path):
    cfg = TrainerConfig(max_opts=123, num_envs=7)
    p = str(tmp_path / "cfg.yaml")
    cfg.save(p)
    loaded = TrainerConfig.load(p)
    assert loaded == cfg


def test_evaluator_deterministic():
    env = make("CartPole-v1")
    agent = DQN(DQNConfig(hidden=(8,)))
    state = agent.init(
        jax.random.PRNGKey(0),
        env.observation_space(env.default_params),
        env.action_space(env.default_params),
    )
    ev = Evaluator(env, n_episodes=3, max_steps=50)
    s1, r1 = ev.evaluate(agent, state, eval_index=0)
    s2, _ = ev.evaluate(agent, state, eval_index=0)
    s3, _ = ev.evaluate(agent, state, eval_index=1)
    assert s1 == s2  # seeded resets (≙ reset_with_index determinism)
    assert "Episode return" in r1


def test_full_state_resume_bit_exact(tmp_path):
    """Kill-and-resume equals an uninterrupted run, bit for bit (the
    checkpoint superset the reference lacks — SURVEY.md §5.4)."""
    from border_tpu.utils import CheckpointManager

    cfg = TrainerConfig(
        max_opts=20,
        warmup_period=0,
        opt_interval=16,
        batch_size=16,
        num_envs=8,
        steps_per_chunk=8,
        seed=5,
    )

    def build(mgr, interval):
        env = make("CartPole-v1")
        agent = DQN(DQNConfig(hidden=(16,)))
        return Trainer(
            env, agent, ReplayBuffer(512), cfg,
            checkpoint_manager=mgr, checkpoint_interval=interval,
        )

    # uninterrupted run, checkpointing mid-flight (at opt 8 and 16; run
    # ends at 20, strictly past the last checkpoint)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=5)
    res_full = build(mgr, 8).train()
    assert mgr.latest_step() == 16 < res_full.opt_steps

    # "killed" process: a fresh trainer resumes from the latest checkpoint
    res_resumed = build(None, 0).train(resume_from=mgr)
    mgr.close()

    assert res_resumed.opt_steps == res_full.opt_steps
    assert res_resumed.env_steps == res_full.env_steps
    for a, b in zip(
        jax.tree.leaves(res_full.agent_state),
        jax.tree.leaves(res_resumed.agent_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(res_full.buffer_state),
        jax.tree.leaves(res_resumed.buffer_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_evaluator_truncation_and_early_exit():
    """Long episodes are flagged, not silently capped (VERDICT r2 weak #5);
    the while_loop exits early once every instance finishes."""
    env = make("CartPole-v1")
    agent = DQN(DQNConfig(hidden=(16,)))
    # horizon 5: an untrained CartPole policy survives >5 steps, so every
    # instance is still running at the cap → all truncated
    ev_short = Evaluator(env, n_episodes=3, max_steps=5)
    state = agent.init(
        jax.random.PRNGKey(0),
        ev_short.vec.observation_space,
        ev_short.vec.action_space,
    )
    score, rec = ev_short.evaluate(agent, state)
    assert rec["Episodes truncated"] == 3.0
    assert all(l == 5 for l in [rec["Episode length"]])
    # huge horizon: episodes end (pole falls) long before the cap; the
    # early exit makes this cheap and nothing is truncated
    ev_long = Evaluator(env, n_episodes=3, max_steps=100_000)
    score, rec = ev_long.evaluate(agent, state)
    assert rec["Episodes truncated"] == 0.0
    assert rec["Episode length"] < 1_000


def test_clip_reward_nstep_rejected():
    """clip_reward clips per-step rewards; with an n-step buffer the
    sampled reward is the accumulated return — the combination silently
    computes a different target, so the Trainer rejects it (ADVICE r2)."""
    import pytest

    from border_tpu.errors import ConfigError

    env = make("CartPole-v1")
    agent = DQN(DQNConfig(hidden=(16,), clip_reward=1.0))
    buf = ReplayBuffer(1024, n_step=3, stride=SMALL.num_envs)
    with pytest.raises(ConfigError, match="n-step"):
        Trainer(env, agent, buf, SMALL)
    # 1-step clip_reward stays allowed
    Trainer(env, agent, ReplayBuffer(1024), SMALL)


def test_updates_per_sample_batch_accounting_and_guards():
    """updates_per_sample_batch=k draws one k·B sample per scan iteration
    and applies k SEQUENTIAL B-sized updates: the chunk's update count is
    unchanged, metrics stay finite, and invalid/PER combinations fall
    back or fail loudly."""
    import dataclasses

    import pytest

    from border_tpu.errors import ConfigError

    env = make("CartPole-v1")
    cfg = dataclasses.replace(SMALL, updates_per_sample_batch=2,
                              warmup_period=0)
    tr = Trainer(env, DQN(DQNConfig(hidden=(16,))), ReplayBuffer(1024), cfg)
    k = jax.random.PRNGKey(0)
    a, v, b = tr.init_states(k, k)
    out = tr._chunk(a, v, b, k, True)
    jax.block_until_ready(out[0])
    assert int(out[0].n_opts) == tr.updates_per_chunk
    assert np.isfinite(float(out[3]["loss"]))

    # k must divide the chunk's update count
    bad = dataclasses.replace(cfg, updates_per_sample_batch=7)
    tr_bad = Trainer(env, DQN(DQNConfig(hidden=(16,))), ReplayBuffer(1024),
                     bad)
    a, v, b = tr_bad.init_states(k, k)
    with pytest.raises(ConfigError, match="updates_per_sample_batch"):
        tr_bad._chunk(a, v, b, k, True)

    # PER keeps the strict sample→update→feedback ordering: the knob is
    # ignored (sequential path) and the chunk still runs
    per_cfg = dataclasses.replace(cfg, updates_per_sample_batch=2)
    tr_per = Trainer(env, DQN(DQNConfig(hidden=(16,))),
                     ReplayBuffer(1024, per=PerConfig()), per_cfg)
    a, v, b = tr_per.init_states(k, k)
    out = tr_per._chunk(a, v, b, k, True)
    jax.block_until_ready(out[0])
    assert int(out[0].n_opts) == tr_per.updates_per_chunk
