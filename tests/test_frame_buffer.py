"""Frame-dedup replay buffer: stack reconstruction correctness."""

import jax
import jax.numpy as jnp
import numpy as np

from border_tpu.agents import DQN, DQNConfig
from border_tpu.core.env import VecEnv
from border_tpu.envs import make
from border_tpu.models import AtariCNN
from border_tpu.replay import FrameReplayBuffer
from border_tpu.train import Trainer, TrainerConfig


def _fill(buf, num_envs=2, steps=20, seed=0):
    """Drive real Pong steps and mirror pushes into a python-side log."""
    env = make("Pong-v0")
    vec = VecEnv(env, num_envs)
    state = vec.reset(jax.random.PRNGKey(seed))
    bstate = buf.init()
    log = []  # per step: (prev_obs, act, reward, term, trunc, ep_len)
    key = jax.random.PRNGKey(seed + 1)
    for t in range(steps):
        key, k = jax.random.split(key)
        act = jax.random.randint(k, (num_envs,), 0, 6)
        prev_obs = state.obs
        prev_len = state.episode_length
        ts, state = vec.step(state, act)
        bstate = buf.process_step(bstate, prev_obs, act, ts, prev_len)
        log.append(
            (np.asarray(prev_obs), np.asarray(act), np.asarray(ts.reward),
             np.asarray(prev_len))
        )
    return buf, bstate, log


def test_stack_reconstruction_matches_env_obs():
    """The reconstructed obs stack must equal the env's own stacked obs."""
    buf = FrameReplayBuffer(capacity=64, num_envs=2)
    buf, bstate, log = _fill(buf, steps=20)

    batch = buf.sample(bstate, jax.random.PRNGKey(7), 64)
    obs = np.asarray(batch.obs)
    act = np.asarray(batch.act)
    rew = np.asarray(batch.reward)
    ix = np.asarray(batch.ix_sample)
    for b in range(64):
        e, p = ix[b] // buf.capacity, ix[b] % buf.capacity
        s = p  # total < capacity here, so absolute == position
        want_obs, want_act, want_rew, _ = log[s]
        assert act[b] == want_act[e]
        assert np.isclose(rew[b], want_rew[e])
        assert np.array_equal(obs[b], want_obs[e]), f"stack mismatch at s={s} e={e}"


def test_next_obs_is_following_obs_within_episode():
    buf = FrameReplayBuffer(capacity=64, num_envs=2)
    buf, bstate, log = _fill(buf, steps=20)
    batch = buf.sample(bstate, jax.random.PRNGKey(3), 64)
    nobs = np.asarray(batch.next_obs)
    ix = np.asarray(batch.ix_sample)
    term = np.asarray(batch.terminated)
    for b in range(64):
        e, s = ix[b] // buf.capacity, ix[b] % buf.capacity
        if not term[b] and s + 1 < len(log):
            _, _, _, next_len = log[s + 1]
            if next_len[e] > 0:  # same episode continued
                want = log[s + 1][0][e]
                assert np.array_equal(nobs[b], want)


def test_ring_wraparound_sampling_in_range():
    buf = FrameReplayBuffer(capacity=8, num_envs=2)
    buf, bstate, log = _fill(buf, steps=20)  # total=20 > cap=8
    assert int(bstate.total) == 20
    batch = buf.sample(bstate, jax.random.PRNGKey(1), 128)
    # absolute steps must lie in [total-size+4, total-1) = [16, 19)
    # → positions (s % 8) ∈ {0, 1, 2}  for s ∈ {16, 17, 18}
    pos = np.asarray(batch.ix_sample) % buf.capacity
    assert set(np.unique(pos)).issubset({0, 1, 2})


def test_nstep_rewards_and_discount():
    """n-step: reward = Σ γ^k r, stopped at boundaries, discount = γ^m."""
    n_step, gamma = 3, 0.9
    buf = FrameReplayBuffer(capacity=64, num_envs=2, n_step=n_step, gamma=gamma)
    buf, bstate, log = _fill(buf, steps=30)
    batch = buf.sample(bstate, jax.random.PRNGKey(5), 256)
    ix = np.asarray(batch.ix_sample)
    rew_n = np.asarray(batch.reward)
    disc = np.asarray(batch.discount)

    raw_r = np.stack([l[2] for l in log])  # [T, E]
    ages = np.stack([l[3] for l in log])  # [T, E] step-in-episode pre-step
    for b in range(256):
        e, s = ix[b] // buf.capacity, ix[b] % buf.capacity
        want, m = 0.0, 0
        for k in range(n_step):
            # boundary before step k: next step starts a new episode
            if k > 0 and ages[s + k][e] == 0:
                break
            want += gamma**k * raw_r[s + k][e]
            m += 1
        assert np.isclose(rew_n[b], want, atol=1e-5), (b, e, s, rew_n[b], want)
        assert np.isclose(disc[b], gamma**m, atol=1e-6)


def test_trainer_with_frame_buffer_runs():
    env = make("Pong-v0")
    agent = DQN(
        DQNConfig(model=lambda n: AtariCNN(out_dim=n), lr=1e-4, double_dqn=True)
    )
    cfg = TrainerConfig(
        max_opts=2, warmup_period=8, opt_interval=64, batch_size=8,
        num_envs=4, steps_per_chunk=4, eval_interval=10**9,
    )
    buf = FrameReplayBuffer(capacity=32, num_envs=4)
    tr = Trainer(env, agent, buf, cfg)
    res = tr.train()
    assert res.opt_steps >= 2
