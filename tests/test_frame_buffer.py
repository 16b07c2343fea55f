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


# ---------------------------------------------------------------------------
# PER over the (env × slot) leaf space (VERDICT r2 next #7)
# ---------------------------------------------------------------------------
def test_per_residency_and_max_priority_entry():
    """Prioritized draws only ever land on resident windows — the same
    draw range as the uniform sampler — even after ring wraparound."""
    from border_tpu.replay import PerConfig

    buf = FrameReplayBuffer(capacity=8, num_envs=2, per=PerConfig())
    buf, bstate, log = _fill(buf, steps=20)  # total=20 > cap=8
    batch = buf.sample(bstate, jax.random.PRNGKey(1), 256)
    # exact residency: stack frames un-overwritten (s ≥ total−cap+3 = 15)
    # and n_step successor present (s ≤ total−2 = 18) → pos {7, 0, 1, 2}.
    # (The uniform sampler's lo = total−size+stack is conservative by
    # stack−1; the priority maintenance is exact.)
    pos = np.asarray(batch.ix_sample) % buf.capacity
    assert set(np.unique(pos)).issubset({7, 0, 1, 2})
    # fresh transitions enter at (uniform) max priority → IS weights all 1
    assert np.allclose(np.asarray(batch.weight), 1.0)


def test_per_priority_feedback_biases_sampling():
    """update_priority concentrates the draw on high-|td| leaves and the
    IS weights compensate (w < 1 for over-sampled leaves)."""
    from border_tpu.replay import PerConfig

    buf = FrameReplayBuffer(capacity=32, num_envs=2,
                            per=PerConfig(alpha=1.0, beta_0=1.0))
    buf, bstate, log = _fill(buf, steps=32)
    b0 = buf.sample(bstate, jax.random.PRNGKey(0), 64)
    # crush every sampled leaf's priority except one favorite
    fav = int(np.asarray(b0.ix_sample)[0])
    td = np.where(np.asarray(b0.ix_sample) == fav, 1000.0, 1e-6)
    bstate = buf.update_priority(bstate, b0.ix_sample, jnp.asarray(td))
    b1 = buf.sample(bstate, jax.random.PRNGKey(2), 256)
    ix1 = np.asarray(b1.ix_sample)
    frac_fav = np.mean(ix1 == fav)
    assert frac_fav > 0.3, frac_fav  # heavily biased toward the favorite
    # the favorite is over-sampled → its IS weight is the minimum
    w = np.asarray(b1.weight)
    assert w[ix1 == fav].max() <= w[ix1 != fav].min() + 1e-6


def test_per_nstep_windows_resident():
    """n-step PER: the activation lag keeps every sampled window fully
    inside the written region."""
    from border_tpu.replay import PerConfig

    n_step = 3
    buf = FrameReplayBuffer(capacity=16, num_envs=2, n_step=n_step,
                            gamma=0.9, per=PerConfig())
    buf, bstate, log = _fill(buf, steps=40)
    batch = buf.sample(bstate, jax.random.PRNGKey(4), 256)
    # exact residency: s ≥ total − cap + 3 (stack un-overwritten) and
    # s ≤ total − 1 − n_step (window activated)
    pos = np.asarray(batch.ix_sample) % buf.capacity
    total, cap = 40, 16
    valid_pos = {s % cap for s in range(total - cap + 3, total - n_step)}
    assert set(np.unique(pos)).issubset(valid_pos)
    assert np.isfinite(np.asarray(batch.reward)).all()


def test_per_frame_buffer_in_sharded_trainer():
    """Priorities update and IS weights flow on the virtual mesh: the
    fused sharded chunk runs DQN + PER frame replay end-to-end and the
    per-shard trees pick up non-uniform priorities."""
    import pytest

    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")

    from border_tpu.parallel import ShardedTrainer
    from border_tpu.replay import PerConfig

    n = jax.device_count()
    env = make("Pong-v0")
    agent = DQN(
        DQNConfig(model=lambda a: AtariCNN(out_dim=a), lr=1e-3,
                  double_dqn=True)
    )
    cfg = TrainerConfig(num_envs=2 * n, steps_per_chunk=10,
                        batch_size=2 * n, opt_interval=10, warmup_period=0,
                        max_opts=4)
    buf = FrameReplayBuffer(capacity=16, num_envs=cfg.num_envs,
                            per=PerConfig())
    tr = ShardedTrainer(env, agent, buf, cfg)
    k = jax.random.PRNGKey(0)
    agent_state, vec_state, buf_state = tr.init_states(k, k)
    for i in range(3):
        out = tr._chunk(agent_state, vec_state, buf_state, jax.random.fold_in(k, i), True)
        agent_state, vec_state, buf_state = out[0], out[1], out[2]
    jax.block_until_ready(agent_state)
    leaves = np.asarray(buf_state.tree.sum_tree)
    # the tree carries real mass and |td|-driven (non-uniform) priorities
    assert leaves.max() > 0
    active = leaves[len(leaves) // 2:]
    active = active[active > 0]
    assert active.std() > 0, "priorities never left the uniform init"


def test_union_gather_matches_separate_stack_gathers():
    """The 1-step union gather (one stack+1-row gather) must reproduce
    exactly the frames of the two separate stack gathers it replaced —
    including age-clamped windows right after episode starts."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from border_tpu.core.env import VecEnv
    from border_tpu.envs import make
    from border_tpu.replay import FrameReplayBuffer

    env = make("Pong-v0")
    vec = VecEnv(env, 4)
    buf = FrameReplayBuffer(capacity=32, num_envs=4)
    state = vec.reset(jax.random.PRNGKey(0))
    bs = buf.init()
    key = jax.random.PRNGKey(1)
    step = jax.jit(vec.step)
    proc = jax.jit(buf.process_step)
    for i in range(20):
        key, k = jax.random.split(key)
        act = jax.random.randint(k, (4,), 0, 6)
        prev_obs, prev_len = state.obs, state.episode_length
        ts, state = step(state, act)
        bs = proc(bs, prev_obs, act, ts, prev_len)

    # every sampleable (e, s): union == separate
    lo = int(bs.total) - min(int(bs.total), buf.capacity) + buf.stack
    hi = int(bs.total) - buf.n_step
    ss = jnp.arange(lo, hi, dtype=jnp.int32)
    for e_i in range(4):
        e = jnp.full_like(ss, e_i)
        p = (ss % buf.capacity).astype(jnp.int32)
        ages = bs.age[e, p]
        obs_u, next_u = buf._gather_union(bs, e, ss, ages)
        obs_s = buf._gather_stack(bs, e, ss, ages)
        next_s = buf._gather_stack(bs, e, ss + 1, ages + 1)
        np.testing.assert_array_equal(np.asarray(obs_u), np.asarray(obs_s))
        np.testing.assert_array_equal(np.asarray(next_u), np.asarray(next_s))


def test_slice_mode_matches_union_gather():
    """sample_mode="slice" (streaming dynamic_slice windows + select
    clamp, mirror-padded ring) must reproduce the union gather's frames
    exactly for every sampleable (step, env-block) — including windows
    that span the ring's wrap point (served by the mirror slots) and
    age-clamped windows right after episode starts."""
    env = make("Pong-v0")
    vec = VecEnv(env, 4)
    buf = FrameReplayBuffer(capacity=16, num_envs=4, sample_mode="slice",
                            slice_group=2)
    state = vec.reset(jax.random.PRNGKey(0))
    bs = buf.init()
    assert bs.frames.shape[1] == 16 + buf.slot_pad
    key = jax.random.PRNGKey(1)
    step = jax.jit(vec.step)
    proc = jax.jit(buf.process_step)
    for i in range(40):  # wraps the 16-slot ring 2.5×
        key, k = jax.random.split(key)
        act = jax.random.randint(k, (4,), 0, 6)
        prev_obs, prev_len = state.obs, state.episode_length
        ts, state = step(state, act)
        bs = proc(bs, prev_obs, act, ts, prev_len)

    total = int(bs.total)
    lo = total - min(total, buf.capacity) + buf.stack
    hi = total - buf.n_step
    for s0 in range(lo, hi):
        for e0v in (0, 2):
            s_g = jnp.array([s0], jnp.int32)
            e0 = jnp.array([e0v], jnp.int32)
            e = e0v + jnp.arange(2, dtype=jnp.int32)
            s = jnp.full((2,), s0, jnp.int32)
            p = (s % buf.capacity).astype(jnp.int32)
            ages = bs.age[e, p]
            obs_sl, next_sl = buf._gather_slice(bs, s_g, e0, ages)
            obs_u, next_u = buf._gather_union(bs, e, s, ages)
            np.testing.assert_array_equal(np.asarray(obs_sl), np.asarray(obs_u))
            np.testing.assert_array_equal(np.asarray(next_sl), np.asarray(next_u))


def test_slice_mode_sample_and_trainer():
    """sample() in slice mode: correct shapes, in-range draws, and the
    fused Trainer runs a warmed chunk end to end."""
    buf = FrameReplayBuffer(capacity=32, num_envs=4, sample_mode="slice",
                            slice_group=2)
    buf, bstate, log = _fill(buf, num_envs=4, steps=20)
    batch = buf.sample(bstate, jax.random.PRNGKey(9), 8)
    assert batch.obs.shape == (8, 84, 84, 4)
    ix = np.asarray(batch.ix_sample)
    e, p = ix // buf.capacity, ix % buf.capacity
    assert (e < 4).all() and (p < 32).all()
    # env blocks are aligned pairs; all group members share a slot
    assert (e.reshape(-1, 2) == e.reshape(-1, 2)[:, :1] + [0, 1]).all()
    assert (p.reshape(-1, 2) == p.reshape(-1, 2)[:, :1]).all()
    # draws respect the uniform range [lo, hi)
    s = p  # total < capacity
    assert (s >= buf.stack).all() and (s < int(bstate.total) - 1).all()

    env = make("Pong-v0")
    agent = DQN(DQNConfig(model=lambda n: AtariCNN(out_dim=n), lr=1e-4))
    cfg = TrainerConfig(num_envs=4, steps_per_chunk=8, batch_size=8,
                        opt_interval=8, warmup_period=0, max_opts=10)
    tr = Trainer(env, agent,
                 FrameReplayBuffer(capacity=32, num_envs=4,
                                   sample_mode="slice", slice_group=2), cfg)
    k = jax.random.PRNGKey(0)
    a, v, b = tr.init_states(k, k)
    out = tr._chunk(a, v, b, k, True)
    jax.block_until_ready(out[0])
    assert np.isfinite(float(out[3]["loss"]))
