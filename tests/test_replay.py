"""Replay buffer + PER sum-tree tests.

≙ reference unit tests: sum-tree prefix retrieval
(border-core/src/generic_replay_buffer/base/sum_tree.rs:176-217) and
SimpleReplayBuffer push/batch semantics (base.rs:295-316,376-402).
"""

import jax
import jax.numpy as jnp
import numpy as np

from border_tpu.replay import PerConfig, ReplayBuffer, SumTree, Transition


def _tr(n, obs_dim=3):
    return Transition(
        obs=jnp.arange(n * obs_dim, dtype=jnp.float32).reshape(n, obs_dim),
        act=jnp.arange(n, dtype=jnp.int32),
        next_obs=jnp.ones((n, obs_dim), jnp.float32),
        reward=jnp.arange(n, dtype=jnp.float32),
        terminated=jnp.zeros((n,), jnp.bool_),
        truncated=jnp.zeros((n,), jnp.bool_),
    )


def test_push_ring_wraparound():
    buf = ReplayBuffer(capacity=8)
    state = buf.init(jax.tree.map(lambda x: x[0], _tr(1)))
    state = buf.push(state, _tr(6))
    assert int(state.size) == 6 and int(state.cursor) == 6
    state = buf.push(state, _tr(6))
    assert int(state.size) == 8 and int(state.cursor) == 4
    # slots 0..3 hold the tail of the second push (items 2..5)
    assert np.allclose(np.asarray(state.data.reward[:4]), [2, 3, 4, 5])
    # slots 6..7 hold items 0..1 of the second push
    assert np.allclose(np.asarray(state.data.reward[6:]), [0, 1])


def test_uniform_sample_within_size():
    buf = ReplayBuffer(capacity=16)
    state = buf.init(jax.tree.map(lambda x: x[0], _tr(1)))
    state = buf.push(state, _tr(5))
    batch = buf.sample(state, jax.random.PRNGKey(0), 64)
    idx = np.asarray(batch.ix_sample)
    assert (idx >= 0).all() and (idx < 5).all()
    assert np.allclose(np.asarray(batch.weight), 1.0)
    assert len(batch) == 64


def test_sum_tree_total_and_sampling_distribution():
    tree = SumTree(8)
    st = tree.init()
    pri = jnp.array([1.0, 2.0, 3.0, 4.0, 0.0, 0.0, 0.0, 0.0])
    st = tree.update(st, jnp.arange(8), pri)
    assert np.isclose(float(tree.total(st)), 10.0)
    # sampling frequencies should be proportional to priority
    idx = tree.sample(st, jax.random.PRNGKey(0), 4096)
    idx = np.asarray(idx)
    counts = np.bincount(idx, minlength=8) / len(idx)
    assert np.allclose(counts[:4], np.asarray(pri[:4]) / 10.0, atol=0.03)
    assert counts[4:].sum() == 0


def test_sum_tree_duplicate_index_update():
    tree = SumTree(8)
    st = tree.init()
    # duplicate index 3 in one batched update — last write wins, parents
    # recomputed from children (no delta-accumulation bug)
    st = tree.update(st, jnp.array([3, 3, 1]), jnp.array([5.0, 7.0, 2.0]))
    assert np.isclose(float(tree.total(st)), 9.0)


def test_per_weights_and_priority_update():
    per = PerConfig(alpha=0.6, beta_0=0.4)
    buf = ReplayBuffer(capacity=16, per=per)
    state = buf.init(jax.tree.map(lambda x: x[0], _tr(1)))
    state = buf.push(state, _tr(10))
    batch = buf.sample(state, jax.random.PRNGKey(1), 32, n_opts=jnp.int32(0))
    w = np.asarray(batch.weight)
    assert (w > 0).all() and (w <= 1.0 + 1e-5).all()
    # feed back distinct td errors; sampling should then favor high-|td|
    state = buf.update_priority(
        state, jnp.arange(10), jnp.array([10.0] + [0.01] * 9)
    )
    idx = np.asarray(buf.sample(state, jax.random.PRNGKey(2), 512).ix_sample)
    assert (idx == 0).mean() > 0.5


def test_beta_annealing():
    per = PerConfig(beta_0=0.4, beta_final=1.0, n_opts_final=100)
    assert np.isclose(float(per.beta(jnp.int32(0))), 0.4)
    assert np.isclose(float(per.beta(jnp.int32(50))), 0.7)
    assert np.isclose(float(per.beta(jnp.int32(1000))), 1.0)


def test_push_sample_jit_fused():
    """push/sample compose under jit (the whole path must stay on device)."""
    buf = ReplayBuffer(capacity=32)
    state = buf.init(jax.tree.map(lambda x: x[0], _tr(1)))

    @jax.jit
    def step(state, key):
        state = buf.push(state, _tr(4))
        batch = buf.sample(state, key, 8)
        return state, batch

    state, batch = step(state, jax.random.PRNGKey(0))
    assert batch.obs.shape == (8, 3)


class TestNStepReplayBuffer:
    """n-step backups in the flat ring buffer (the n>1 extension the
    reference documents but never implements, batch.rs:19-23).  Stride
    encodes the ring distance between one env's consecutive transitions."""

    def _fill(self, buffer, rewards, dones):
        import jax.numpy as jnp

        from border_tpu.replay import Transition

        obs = jnp.arange(len(rewards), dtype=jnp.float32)[:, None]
        state = buffer.init(
            Transition(obs=obs[0], act=jnp.int32(0), next_obs=obs[0],
                       reward=jnp.float32(0), terminated=jnp.bool_(False),
                       truncated=jnp.bool_(False))
        )
        batch = Transition(
            obs=obs, act=jnp.zeros(len(rewards), jnp.int32),
            next_obs=obs + 100.0,
            reward=jnp.asarray(rewards, jnp.float32),
            terminated=jnp.asarray(dones, bool),
            truncated=jnp.zeros(len(rewards), bool),
        )
        return buffer.push(state, batch)

    def test_nstep_accumulation_and_boundary(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from border_tpu.replay import ReplayBuffer

        g = 0.9
        buffer = ReplayBuffer(capacity=64, n_step=3, gamma=g, stride=1)
        # rewards 1..8; episode boundary after index 3
        state = self._fill(buffer, [1, 2, 3, 4, 5, 6, 7, 8],
                           [False, False, False, True, False, False, False, False])
        batch = buffer.sample(state, jax.random.PRNGKey(0), 256)
        idx = np.asarray(batch.ix_sample)
        # window always fits: d >= (n-1)*stride keeps idx <= 5
        assert idx.max() <= 5
        r = np.asarray(batch.reward)
        disc = np.asarray(batch.discount)
        nobs = np.asarray(batch.next_obs)[:, 0]
        for i, b in enumerate(idx):
            if b <= 1:  # full 3-step windows without boundary
                want = (b + 1) + g * (b + 2) + g * g * (b + 3)
                assert abs(r[i] - want) < 1e-5
                assert abs(disc[i] - g ** 3) < 1e-6
                assert nobs[i] == b + 2 + 100.0
            if b == 3:  # starts AT the boundary: stops after 1 step
                assert abs(r[i] - 4.0) < 1e-5
                assert abs(disc[i] - g) < 1e-6
                assert bool(batch.terminated[i])
            if b == 2:  # crosses the boundary after 2 steps
                want = 3 + g * 4
                assert abs(r[i] - want) < 1e-5
                assert abs(disc[i] - g * g) < 1e-6

    def test_nstep_stride_interleaved_envs(self):
        import jax
        import numpy as np

        from border_tpu.replay import ReplayBuffer

        g = 0.5
        # two envs pushed in lockstep: env0 rewards 1,3,5,7; env1 2,4,6,8
        buffer = ReplayBuffer(capacity=64, n_step=2, gamma=g, stride=2)
        state = self._fill(buffer, [1, 2, 3, 4, 5, 6, 7, 8],
                           [False] * 8)
        batch = buffer.sample(state, jax.random.PRNGKey(1), 256)
        idx = np.asarray(batch.ix_sample)
        r = np.asarray(batch.reward)
        for i, b in enumerate(idx):
            want = (b + 1) + g * (b + 3)  # same-env next sits 2 slots later
            assert abs(r[i] - want) < 1e-5

    def test_nstep_trainer_stride_validation(self):
        import pytest

        from border_tpu.envs import make
        from border_tpu.errors import ConfigError
        from border_tpu.replay import ReplayBuffer
        from border_tpu.train import Trainer, TrainerConfig
        from border_tpu.agents import DQN, DQNConfig

        env = make("CartPole-v1")
        cfg = TrainerConfig(num_envs=8, steps_per_chunk=4, batch_size=8,
                            opt_interval=8, warmup_period=0, max_opts=2)
        with pytest.raises(ConfigError):
            Trainer(env, DQN(DQNConfig(hidden=(8,))),
                    ReplayBuffer(256, n_step=3, stride=1), cfg)
        # correct stride: trains end to end with n-step targets
        tr = Trainer(env, DQN(DQNConfig(hidden=(8,))),
                     ReplayBuffer(256, n_step=3, stride=8), cfg)
        res = tr.train()
        assert res.opt_steps >= 2

    def test_nstep_fill_respects_window_margin(self):
        """fill() counts only positions whose whole n-step window is
        written — warmup cannot pass while sampling would land on
        unwritten slots (code-review r2 finding)."""
        import jax.numpy as jnp

        from border_tpu.replay import ReplayBuffer

        buffer = ReplayBuffer(capacity=64, n_step=3, gamma=0.9, stride=4)
        state = self._fill(buffer, [1.0] * 8, [False] * 8)  # 2 vec steps
        assert int(buffer.fill(state)) == 0  # lo = 2*4 = 8 = size
        state = self._fill(buffer, [1.0] * 12, [False] * 12)
        assert int(buffer.fill(state)) == 4

    def test_nstep_stride_validated_in_async_and_sharded(self):
        import jax
        import pytest

        from border_tpu.agents import DQN, DQNConfig
        from border_tpu.envs import make
        from border_tpu.errors import ConfigError
        from border_tpu.replay import ReplayBuffer
        from border_tpu.train import AsyncTrainer, TrainerConfig

        env = make("CartPole-v1")
        cfg = TrainerConfig(num_envs=8, steps_per_chunk=4, batch_size=8,
                            opt_interval=8, warmup_period=0, max_opts=2)
        with pytest.raises(ConfigError):
            AsyncTrainer(env, DQN(DQNConfig(hidden=(8,))),
                         ReplayBuffer(256, n_step=2, stride=1), cfg)
        if jax.device_count() >= 2:
            from border_tpu.parallel import ShardedTrainer

            n = jax.device_count()
            cfg_s = TrainerConfig(num_envs=2 * n, steps_per_chunk=4,
                                  batch_size=2 * n, opt_interval=8,
                                  warmup_period=0, max_opts=2)
            # global-stride buffer must be rejected: shards see local pushes
            with pytest.raises(ConfigError):
                ShardedTrainer(env, DQN(DQNConfig(hidden=(8,))),
                               ReplayBuffer(256, n_step=2, stride=2 * n),
                               cfg_s)
            # per-device stride is accepted and trains
            tr = ShardedTrainer(env, DQN(DQNConfig(hidden=(8,))),
                                ReplayBuffer(256, n_step=2, stride=2), cfg_s)
            assert tr.train().opt_steps >= 2
