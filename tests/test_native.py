"""Native C++ envpool tests (build + ABI + behavioral parity)."""

import numpy as np
import pytest

from border_tpu.envs.native import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="cpp toolchain unavailable"
)


def test_native_cartpole_steps_and_autoresets():
    from border_tpu.envs.native import NativeVecEnv

    env = NativeVecEnv("CartPole-v1", 64, seed=0)
    obs = env.reset()
    assert obs.shape == (64, 4)
    rng = np.random.RandomState(0)
    terms = 0
    for _ in range(500):
        obs, r, term, trunc = env.step(rng.randint(0, 2, size=64))
        assert (r == 1.0).all()
        terms += term.sum()
        # auto-reset keeps obs in the fresh-start envelope after done
        assert np.isfinite(obs).all()
    assert terms > 0
    env.close()


def test_native_vs_jax_episode_length_parity():
    """Same dynamics constants → same random-policy episode-length stats."""
    import jax
    import jax.numpy as jnp

    from border_tpu.core.env import VecEnv
    from border_tpu.envs import make
    from border_tpu.envs.native import NativeVecEnv

    # native: measure mean episode length under uniform random policy
    env = NativeVecEnv("CartPole-v1", 128, seed=1)
    env.reset()
    rng = np.random.RandomState(1)
    done_count = 0
    steps = 3_000
    for _ in range(steps):
        _, _, term, trunc = env.step(rng.randint(0, 2, size=128))
        done_count += (term | trunc).sum()
    native_mean_len = steps * 128 / max(done_count, 1)
    env.close()

    # JAX twin
    jenv = make("CartPole-v1")
    vec = VecEnv(jenv, 128)
    state = vec.reset(jax.random.PRNGKey(0))

    @jax.jit
    def roll(state, key):
        def body(st, k):
            acts = jax.random.randint(k, (128,), 0, 2)
            ts, st = vec.step(st, acts)
            return st, ts.done

        return jax.lax.scan(body, state, jax.random.split(key, steps))

    _, done = roll(state, jax.random.PRNGKey(1))
    jax_mean_len = steps * 128 / max(int(np.asarray(done).sum()), 1)

    assert abs(native_mean_len - jax_mean_len) < 0.15 * jax_mean_len, (
        f"native {native_mean_len:.1f} vs jax {jax_mean_len:.1f}"
    )


def test_native_pendulum_reward_range():
    from border_tpu.envs.native import NativeVecEnv

    env = NativeVecEnv("Pendulum-v1", 32, seed=0)
    env.reset()
    rng = np.random.RandomState(0)
    truncs = 0
    for _ in range(250):
        obs, r, term, trunc = env.step(rng.randint(0, 17, size=32))
        assert (r <= 0).all() and (r > -18).all()
        assert not term.any()  # pendulum never terminates
        truncs += trunc.sum()
    assert truncs == 32  # exactly one 200-step truncation per env so far
    env.close()


def test_async_feeder_pipeline_order():
    from border_tpu.envs.native import AsyncEnvFeeder, NativeVecEnv

    f = AsyncEnvFeeder(NativeVecEnv("CartPole-v1", 16, seed=2))
    f.env.reset()
    rng = np.random.RandomState(2)
    f.submit(rng.randint(0, 2, size=16))
    outs = []
    for _ in range(50):
        outs.append(f.collect())
        f.submit(rng.randint(0, 2, size=16))
    f.collect()
    f.close()
    assert len(outs) == 50
    assert all(o[0].shape == (16, 4) for o in outs)


def test_native_pixel_breakout_mechanics():
    """C++ PixelBreakout (envpool id 4/5): obs format, row scoring in
    eval mode, episodic-life train semantics — the host-native path is
    not a Pong one-off."""
    import numpy as np

    from border_tpu.envs.native import NativeVecEnv

    # eval mode: raw row scores, full-game episodes
    env = NativeVecEnv("Breakout-v0", 4, seed=9, train=False)
    assert env.observation_space.shape == (84, 84, 4)
    assert env.action_space.n == 4
    obs = env.reset()
    assert obs.dtype == np.uint8 and obs.shape == (4, 84, 84, 4)
    rng = np.random.default_rng(0)
    total = np.zeros(4)
    terms = 0
    for _ in range(800):
        a = rng.integers(0, 4, 4)
        obs, rew, term, trunc = env.step(a.astype(np.int32))
        total += rew
        terms += int(term.sum())
    env.close()
    assert total.sum() > 0, "random play never broke a brick"
    # eval rewards are raw row scores (1/4/7 per brick within a skip)
    # → all returns integral
    assert np.allclose(total, np.round(total))

    # train mode: sign-clipped rewards, episodic-life terminations come
    # faster than full games (5 lives per game)
    env_t = NativeVecEnv("Breakout-v0", 4, seed=9, train=True)
    env_t.reset()
    rews, terms_t = [], 0
    for _ in range(800):
        a = rng.integers(0, 4, 4)
        obs, rew, term, trunc = env_t.step(a.astype(np.int32))
        rews.append(rew)
        terms_t += int(term.sum())
    env_t.close()
    r = np.concatenate(rews)
    assert set(np.unique(r)).issubset({0.0, 1.0}), "train rewards not sign-clipped"
    assert terms_t > terms, (
        "episodic-life should terminate more often than full games"
    )


def test_host_trainer_breakout_smoke():
    """HostEnvTrainer drives the C++ Breakout end to end (frame mode:
    newest-frame uploads + device stack ring)."""
    import numpy as np

    from border_tpu.agents import DQN, DQNConfig
    from border_tpu.models import AtariCNN
    from border_tpu.replay import FrameReplayBuffer
    from border_tpu.train import HostEnvTrainer, TrainerConfig

    cfg = TrainerConfig(max_opts=2, warmup_period=32, opt_interval=32,
                        batch_size=8, num_envs=8, steps_per_chunk=8,
                        eval_interval=10**9, seed=3)
    tr = HostEnvTrainer("Breakout-v0", DQN(DQNConfig(
        model=lambda n: AtariCNN(out_dim=n), lr=1e-4)),
        FrameReplayBuffer(capacity=32, num_envs=8), cfg)
    res = tr.train()
    tr.env.close()
    assert res.opt_steps >= 2
    import jax

    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(res.agent_state.params))
