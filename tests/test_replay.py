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
