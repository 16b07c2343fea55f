"""HostEnvTrainer: C++ envpool → device learner end-to-end
(≙ the reference's host-ALE + actor-thread + GPU-learner architecture,
border-atari-env/src/atari_env/ale.rs:62-100 + actor/base.rs:120-178)."""

import jax
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


# ---------------------------------------------------------------------------
# External Python (Gymnasium) envs through the host path (VERDICT r2 next #5)
# ---------------------------------------------------------------------------
def test_pyvecenv_interface():
    import numpy as np

    from border_tpu.envs import PyVecEnv

    env = PyVecEnv.gym("CartPole-v1", 4, seed=3)
    assert env.num_envs == 4
    assert env.observation_space.shape == (4,)
    assert env.action_space.n == 2
    obs = env.reset()
    assert obs.shape == (4, 4)
    acts = np.array([0, 1, 0, 1], np.int64)
    obs2, final, rew, term, trunc = env.step_final(acts)
    assert obs2.shape == (4, 4) and rew.shape == (4,)
    assert (rew == 1.0).all()
    env.close()


def test_host_trainer_trains_on_real_gymnasium():
    """The reference trains on arbitrary Gymnasium envs
    (border-py-gym-env/src/base.rs:268-340); HostEnvTrainer over PyVecEnv
    covers the same capability: real gymnasium.make('CartPole-v1') envs
    feed the device learner, which learns (return ≥ 60 from ~24 at init)."""
    from border_tpu.agents import DQN, DQNConfig
    from border_tpu.envs import PyVecEnv
    from border_tpu.replay import ReplayBuffer
    from border_tpu.train import HostEnvTrainer, HostEvaluator, TrainerConfig

    num_envs = 16
    cfg = TrainerConfig(
        max_opts=1_200, warmup_period=500, opt_interval=8, batch_size=64,
        num_envs=num_envs, steps_per_chunk=16, eval_interval=400, seed=5,
    )
    env = PyVecEnv.gym("CartPole-v1", num_envs, seed=5)
    evaluator = HostEvaluator(
        lambda n, seed: PyVecEnv.gym("CartPole-v1", n, seed=seed),
        n_episodes=5, max_steps=500,
    )
    tr = HostEnvTrainer(
        env, DQN(DQNConfig(hidden=(64, 64), lr=1e-3, double_dqn=True,
                           eps_final_step=8_000)),
        ReplayBuffer(20_000), cfg, evaluator=evaluator,
    )
    res = tr.train()
    assert res.opt_steps >= cfg.max_opts
    assert res.best_score >= 60.0, res.eval_history


# ---------------------------------------------------------------------------
# Pixel game on the host-native C++ path (VERDICT r2 next #2)
# ---------------------------------------------------------------------------
def test_host_trainer_pixel_pong_frame_mode():
    """84×84 uint8 frames stream from the C++ envpool into the device
    learner: frame-only uploads, device-side stack ring, frame-dedup
    replay.  Smoke-scale here; the committed learning curve runs on the
    chip (benchmarks/learning.py pong_host)."""
    import numpy as np

    from border_tpu.agents import DQN, DQNConfig
    from border_tpu.models import AtariCNN
    from border_tpu.replay import FrameReplayBuffer
    from border_tpu.train import HostEnvTrainer, HostEvaluator, TrainerConfig

    num_envs = 8
    cfg = TrainerConfig(
        max_opts=4, warmup_period=64, opt_interval=32, batch_size=16,
        num_envs=num_envs, steps_per_chunk=8, eval_interval=10**9, seed=0,
    )
    tr = HostEnvTrainer(
        "Pong-v0",
        DQN(DQNConfig(model=lambda n: AtariCNN(out_dim=n), lr=1e-4,
                      double_dqn=True)),
        FrameReplayBuffer(capacity=64, num_envs=num_envs), cfg,
    )
    assert tr.frame_mode
    res = tr.train()
    assert res.opt_steps >= 4
    assert np.isfinite(
        np.asarray(jax.tree.leaves(res.agent_state.params)[0])
    ).all()
    # the frame ring holds real (non-zero) frames (total = per-env steps)
    assert int(res.buffer_state.total) * num_envs >= res.env_steps > 0
    assert np.asarray(res.buffer_state.frames).max() > 0
    tr.env.close()


def test_host_evaluator_pixel_eval_mode():
    """HostEvaluator on the C++ pixel env: eval variant (unclipped rewards),
    deterministic seeds, truncation flagged."""
    from border_tpu.agents import DQN, DQNConfig
    from border_tpu.models import AtariCNN
    from border_tpu.train import HostEvaluator

    from border_tpu.envs.native import NativeVecEnv

    agent = DQN(DQNConfig(model=lambda n: AtariCNN(out_dim=n)))
    env = NativeVecEnv("Pong-v0", 2, seed=0, train=False)
    state = agent.init(jax.random.PRNGKey(0), env.observation_space,
                       env.action_space)
    env.close()
    ev = HostEvaluator("Pong-v0", n_episodes=2, max_steps=60)
    score, rec = ev.evaluate(agent, state)
    assert np.isfinite(score)
    assert rec["Episodes truncated"] == 2.0  # 60 steps can't finish Pong


def test_host_trainer_checkpoint_resume(tmp_path):
    """HostEnvTrainer resume: device-side training state (agent + replay +
    counters) restores from the latest checkpoint; the external host envs
    restart fresh (they are not checkpointable — the documented external-env
    semantics; the reference checkpoints only model params, SURVEY §5.4)."""
    from border_tpu.agents import DQN, DQNConfig
    from border_tpu.replay import ReplayBuffer
    from border_tpu.train import HostEnvTrainer, TrainerConfig
    from border_tpu.utils import CheckpointManager

    cfg = TrainerConfig(max_opts=24, warmup_period=64, opt_interval=8,
                        batch_size=32, num_envs=8, steps_per_chunk=8,
                        eval_interval=10**9, seed=4)

    def build(mgr, interval):
        return HostEnvTrainer(
            "CartPole-v1", DQN(DQNConfig(hidden=(8,))), ReplayBuffer(512),
            cfg, checkpoint_manager=mgr, checkpoint_interval=interval,
        )

    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=3)
    t1 = build(mgr, 8)
    res_full = t1.train()
    t1.env.close()
    ckpt_step = mgr.latest_step()
    assert ckpt_step is not None and ckpt_step <= res_full.opt_steps

    t2 = build(None, 0)
    res_resumed = t2.train(resume_from=mgr)
    t2.env.close()
    mgr.close()

    # counters continued from the checkpoint, training completed
    assert res_resumed.opt_steps >= cfg.max_opts
    assert int(res_resumed.agent_state.n_opts) >= ckpt_step
    # replay persisted through the restore (ring has content beyond what
    # the short post-resume run alone could have written)
    assert int(res_resumed.buffer_state.size) > 0


def test_pyvecenv_dict_obs_flatten():
    """Dict-obs Gymnasium envs train through PyVecEnv with the built-in
    flatten (≙ the reference's dict-obs converters for robotics envs,
    border-py-gym-env/src/candle/*; VERDICT r3 next #3)."""
    import gymnasium
    import numpy as np

    from border_tpu.envs.py_env import PyVecEnv

    class DictReach(gymnasium.Env):
        """2-D point reaches a goal; obs = {achieved, desired} dict."""

        observation_space = gymnasium.spaces.Dict({
            "achieved": gymnasium.spaces.Box(-1, 1, (2,), np.float32),
            "desired": gymnasium.spaces.Box(-1, 1, (2,), np.float32),
        })
        action_space = gymnasium.spaces.Box(-1, 1, (2,), np.float32)

        def reset(self, seed=None, options=None):
            self.rng = np.random.default_rng(seed)
            self.pos = self.rng.uniform(-1, 1, 2).astype(np.float32)
            self.goal = self.rng.uniform(-1, 1, 2).astype(np.float32)
            self.t = 0
            return self._obs(), {}

        def _obs(self):
            return {"achieved": self.pos.copy(), "desired": self.goal.copy()}

        def step(self, a):
            self.pos = np.clip(self.pos + 0.1 * np.asarray(a), -1, 1)
            self.t += 1
            d = float(np.linalg.norm(self.pos - self.goal))
            return self._obs(), -d, d < 0.1, self.t >= 40, {}

    vec = PyVecEnv([DictReach for _ in range(4)], seed=0)
    assert vec.observation_space.shape == (4,)  # 2+2 flattened
    obs = vec.reset()
    assert obs.shape == (4, 4) and obs.dtype == np.float32
    # flatten order: key-sorted (achieved then desired)
    env0 = vec.envs[0]
    np.testing.assert_allclose(obs[0, :2], env0.pos)
    np.testing.assert_allclose(obs[0, 2:], env0.goal)

    # a continuous-action agent trains on it through the host path
    from border_tpu.agents import SAC, SACConfig
    from border_tpu.replay import ReplayBuffer
    from border_tpu.train import HostEnvTrainer, TrainerConfig

    cfg = TrainerConfig(max_opts=8, warmup_period=32, opt_interval=4,
                        batch_size=16, num_envs=4, steps_per_chunk=8,
                        eval_interval=10**9, seed=0)
    tr = HostEnvTrainer(vec, SAC(SACConfig(actor_hidden=(16,),
                                           critic_hidden=(16,))),
                        ReplayBuffer(2048), cfg)
    res = tr.train()
    tr.env.close()
    assert res.opt_steps >= 8
    import jax

    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(res.agent_state.actor_params))


def test_sac_trains_on_real_gymnasium_pendulum():
    """Continuous actions flow host-ward end to end: SAC + PyVecEnv on
    REAL Gymnasium Pendulum-v1 through HostEnvTrainer improves over the
    untrained policy (the full −200 gate is the committed
    pendulum_host curve; ≙ examples/gym/sac_pendulum/src/main.rs +
    border-py-gym-env/src/base.rs:268-340)."""
    import numpy as np

    from border_tpu.agents import SAC, SACConfig
    from border_tpu.envs.py_env import PyVecEnv
    from border_tpu.replay import ReplayBuffer
    from border_tpu.train import (
        HostEnvTrainer, HostEvaluator, TrainerConfig,
    )

    ev = HostEvaluator(
        lambda n, seed: PyVecEnv.gym("Pendulum-v1", n, seed=seed),
        n_episodes=4, max_steps=200,
    )
    agent = SAC(SACConfig(actor_hidden=(64, 64), critic_hidden=(64, 64)))
    vec = PyVecEnv.gym("Pendulum-v1", 16, seed=1)
    cfg = TrainerConfig(max_opts=6000, warmup_period=256, opt_interval=4,
                        batch_size=128, num_envs=16, steps_per_chunk=16,
                        eval_interval=2000, seed=1)
    tr = HostEnvTrainer(vec, agent, ReplayBuffer(65_536), cfg, evaluator=ev)
    # untrained baseline on the same eval protocol
    import jax

    state0 = agent.init(jax.random.PRNGKey(0), vec.observation_space,
                        vec.action_space)
    base, _ = ev.evaluate(agent, state0, eval_index=99)
    res = tr.train()
    tr.env.close()
    assert res.best_score > base + 150, (base, res.best_score)


def test_pyvecenv_flatten_keys_matches_goal_dict_converter():
    """With flatten_keys, PyVecEnv's live obs layout matches
    GoalDictConverter's offline-dataset layout (observation ++
    desired_goal) — required to run a dataset-trained policy on the env
    (code-review r4: the canonical gymnasium flatten is alphabetical and
    includes achieved_goal, a DIFFERENT layout)."""
    import gymnasium
    import numpy as np

    from border_tpu.data.minari import GoalDictConverter
    from border_tpu.envs.py_env import PyVecEnv

    class DictReach(gymnasium.Env):
        observation_space = gymnasium.spaces.Dict({
            "achieved_goal": gymnasium.spaces.Box(-1, 1, (2,), np.float32),
            "desired_goal": gymnasium.spaces.Box(-1, 1, (2,), np.float32),
            "observation": gymnasium.spaces.Box(-1, 1, (4,), np.float32),
        })
        action_space = gymnasium.spaces.Box(-1, 1, (2,), np.float32)

        def reset(self, seed=None, options=None):
            rng = np.random.default_rng(seed)
            self._o = {
                "achieved_goal": rng.uniform(-1, 1, 2).astype(np.float32),
                "desired_goal": rng.uniform(-1, 1, 2).astype(np.float32),
                "observation": rng.uniform(-1, 1, 4).astype(np.float32),
            }
            return self._o, {}

        def step(self, a):
            return self._o, 0.0, False, False, {}

    vec = PyVecEnv([DictReach for _ in range(2)], seed=0,
                   flatten_keys=("observation", "desired_goal"))
    assert vec.observation_space.shape == (6,)  # 4 + 2, no achieved_goal
    obs = vec.reset()
    conv = GoalDictConverter()  # operates on [T, feat] episode arrays
    want = conv.convert_observation(
        {k: v[None] for k, v in vec.envs[0]._o.items()}
    )[0]
    np.testing.assert_allclose(obs[0], want)

    # unknown key is rejected loudly
    import pytest

    with pytest.raises(KeyError, match="flatten_keys"):
        PyVecEnv([DictReach for _ in range(1)], flatten_keys=("nope",))
