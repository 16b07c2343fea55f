"""HBM ring replay buffer with uniform and prioritized sampling.

TPU-native re-design of SimpleReplayBuffer
(border-core/src/generic_replay_buffer/base.rs:86-427):

- storage is a pytree of ``[capacity, ...]`` device arrays (the BatchBase
  array-of-slots abstraction, generic_replay_buffer/batch.rs:45-71),
- ``push`` writes a whole *batch* of transitions at the ring cursor via
  scatter (≙ per-item ring write, base.rs:295-316, but batched — one push per
  vectorized env step instead of one per env),
- ``sample`` is a batched random gather (≙ base.rs:376-402),
- PER uses the vectorized :class:`border_tpu.replay.sum_tree.SumTree` with
  β annealed linearly β₀→β_final over n_opts_final optimizer steps
  (≙ IwScheduler, generic_replay_buffer/base/iw_scheduler.rs:6-46),
- ``update_priority`` writes ``(|td| + eps)^α`` back into the tree
  (≙ base.rs:413-426).

Everything is jit-traceable; the buffer never leaves HBM.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from border_tpu.replay.sum_tree import SumTree, SumTreeState


@struct.dataclass
class Transition:
    """One (possibly batched) environment transition.

    ≙ the fields of GenericTransitionBatch
    (border-core/src/generic_replay_buffer/batch.rs:89-206).
    """

    obs: Any
    act: Any
    next_obs: Any
    reward: jax.Array
    terminated: jax.Array
    truncated: jax.Array


@struct.dataclass
class TransitionBatch(Transition):
    """Sampled batch: transition + PER bookkeeping.

    ``unpack()`` mirrors TransitionBatch::unpack's 8-tuple
    (border-core/src/base/batch.rs:37-96).  ``discount`` is the n-step
    bootstrap factor γ^m (None for 1-step batches) — the n>1 backup the
    reference documents but never implements (batch.rs:19-23,
    step_proc.rs:6-7) is fully supported here.
    """

    weight: jax.Array = None  # IS weights (ones when uniform)
    ix_sample: jax.Array = None  # storage indices (for update_priority)
    discount: Optional[jax.Array] = None  # γ^m for n-step batches

    def unpack(self):
        return (
            self.obs,
            self.act,
            self.next_obs,
            self.reward,
            self.terminated,
            self.truncated,
            self.ix_sample,
            self.weight,
        )

    def __len__(self):
        return self.reward.shape[0]


@dataclasses.dataclass(frozen=True)
class PerConfig:
    """≙ PerConfig (generic_replay_buffer/config.rs:44-120); same defaults."""

    alpha: float = 0.6
    beta_0: float = 0.4
    beta_final: float = 1.0
    n_opts_final: int = 500_000
    normalize_all: bool = True
    eps: float = 1e-6

    def beta(self, n_opts: jax.Array) -> jax.Array:
        """Linear β annealing (≙ IwScheduler::beta, iw_scheduler.rs:6-46)."""
        frac = jnp.clip(n_opts.astype(jnp.float32) / self.n_opts_final, 0.0, 1.0)
        return self.beta_0 + frac * (self.beta_final - self.beta_0)


@struct.dataclass
class ReplayBufferState:
    data: Transition  # pytree of [capacity, ...] arrays
    cursor: jax.Array  # next write position
    size: jax.Array  # number of valid entries
    tree: Optional[SumTreeState]  # PER state (None when uniform)


class ReplayBuffer:
    """Static-config replay buffer; all methods are pure and jit-safe.

    ≙ SimpleReplayBuffer + SimpleReplayBufferConfig
    (generic_replay_buffer/config.rs:44-120).
    """

    def __init__(
        self,
        capacity: int,
        per: Optional[PerConfig] = None,
        n_step: int = 1,
        gamma: float = 0.99,
        stride: int = 1,
    ):
        """``n_step > 1`` makes ``sample`` return n-step backups
        (``reward = Σ γ^k r_{t+k}`` stopped at the first episode boundary,
        ``next_obs`` from t+m, ``discount = γ^m``) — the n>1 extension the
        reference documents but never implements (batch.rs:19-23).

        ``stride`` is the ring distance between a transition and the SAME
        env's next transition: 1 for sequentially-pushed data (offline
        corpora, single env), ``num_envs`` for lockstep vec-env pushes
        (each vec step pushes a [num_envs] batch)."""
        self.capacity = capacity
        self.per = per
        self.n_step = n_step
        self.gamma = gamma
        self.stride = stride
        self.tree = SumTree(capacity) if per is not None else None
        if self.tree is not None and self.tree.capacity != capacity:
            raise ValueError(
                "PER requires a power-of-two capacity "
                f"(got {capacity}; next is {self.tree.capacity})"
            )
        if n_step > 1 and capacity < (n_step + 1) * stride:
            raise ValueError("capacity too small for n_step × stride window")

    # -- construction (≙ ReplayBufferBase::build, base.rs:336-356) ---------
    def init(self, example: Transition) -> ReplayBufferState:
        """Allocate [capacity, ...] storage from one example transition
        (shape/dtype template; lazy-shape-init analogue of TensorBatch,
        border-tch-agent/src/tensor_batch.rs:42-127)."""
        data = jax.tree.map(
            lambda x: jnp.zeros((self.capacity,) + jnp.shape(x), jnp.asarray(x).dtype),
            example,
        )
        return ReplayBufferState(
            data=data,
            cursor=jnp.int32(0),
            size=jnp.int32(0),
            tree=self.tree.init() if self.tree is not None else None,
        )

    # -- ingest (≙ ExperienceBufferBase::push, base.rs:295-316) ------------
    def push(self, state: ReplayBufferState, batch: Transition) -> ReplayBufferState:
        """Write B transitions at the ring cursor (batch axis leading)."""
        n = jax.tree.leaves(batch)[0].shape[0]
        idx = (state.cursor + jnp.arange(n, dtype=jnp.int32)) % self.capacity
        data = jax.tree.map(
            lambda store, x: store.at[idx].set(x.astype(store.dtype)),
            state.data,
            batch,
        )
        tree = state.tree
        if self.tree is not None:
            # Fresh transitions enter at max priority (≙ sum_tree.rs add).
            tree = self.tree.update(
                tree, idx, jnp.full((n,), tree.max_priority, jnp.float32)
            )
        return ReplayBufferState(
            data=data,
            cursor=(state.cursor + n) % self.capacity,
            size=jnp.minimum(state.size + n, self.capacity),
            tree=tree,
        )

    # -- step ingestion (≙ SimpleStepProcessor::process,
    #    generic_replay_buffer/step_proc.rs:103-137): convert one vec-env
    #    Timestep into the stored transition format and push ------------
    def process_step(
        self, state: ReplayBufferState, prev_obs, action, ts, prev_ep_len
    ) -> ReplayBufferState:
        transition = Transition(
            obs=prev_obs,
            act=action,
            next_obs=ts.final_obs,
            reward=ts.reward,
            terminated=ts.terminated,
            truncated=ts.truncated,
        )
        return self.push(state, transition)

    def fill(self, state: ReplayBufferState) -> jax.Array:
        """Sampleable transitions — for n-step buffers only positions whose
        whole window is written count (matches ``sample``'s draw range
        ``d ∈ [(n−1)·stride, size)``), so warmup cannot pass while samples
        would land on unwritten zero slots."""
        if self.n_step > 1:
            lo = (self.n_step - 1) * self.stride
            return jnp.maximum(state.size - lo, 0)
        return state.size

    # -- sampling (≙ ReplayBufferBase::batch, base.rs:376-402) -------------
    def sample(
        self,
        state: ReplayBufferState,
        key: jax.Array,
        batch_size: int,
        n_opts: Optional[jax.Array] = None,
    ) -> TransitionBatch:
        if self.per is None:
            if self.n_step > 1:
                # draw "steps before the cursor" so the whole n-step window
                # is written: d ∈ [(n−1)·stride, size)
                lo = (self.n_step - 1) * self.stride
                hi = jnp.maximum(state.size, lo + 1)
                d = jax.random.randint(key, (batch_size,), lo, hi)
                # under-filled guard: clamp into the written region (the
                # window validity mask in _nstep_batch shortens windows
                # that would cross the oldest data); fill() keeps warmup
                # from sampling at all until real windows exist
                d = jnp.minimum(d, jnp.maximum(state.size - 1, 0))
                idx = (state.cursor - 1 - d) % self.capacity
            else:
                idx = jax.random.randint(
                    key, (batch_size,), 0, jnp.maximum(state.size, 1)
                )
            weight = jnp.ones((batch_size,), jnp.float32)
        else:
            idx = self.tree.sample(state.tree, key, batch_size)
            idx = jnp.minimum(idx, jnp.maximum(state.size, 1) - 1)
            beta = self.per.beta(
                n_opts if n_opts is not None else jnp.int32(0)
            )
            weight = self.tree.weights(
                state.tree, idx, state.size, beta, self.per.normalize_all
            )
        picked = jax.tree.map(lambda store: store[idx], state.data)
        if self.n_step > 1:
            return self._nstep_batch(state, idx, picked, weight)
        return TransitionBatch(
            obs=picked.obs,
            act=picked.act,
            next_obs=picked.next_obs,
            reward=picked.reward,
            terminated=picked.terminated,
            truncated=picked.truncated,
            weight=weight,
            ix_sample=idx,
        )

    def _nstep_batch(self, state, idx, picked, weight) -> TransitionBatch:
        """n-step accumulation along each sampled env's timeline
        (consecutive same-env transitions sit ``stride`` apart in the
        ring), stopped at the first episode boundary and at the write
        cursor (PER-sampled indices may sit close to it)."""
        ks = jnp.arange(self.n_step)  # [n]
        pk = (idx[:, None] + ks[None, :] * self.stride) % self.capacity
        # steps-before-cursor of the base transition bounds the window
        d = (state.cursor - 1 - idx) % self.capacity
        valid = ks[None, :] * self.stride <= d[:, None]
        r_k = state.data.reward[pk]
        done_k = state.data.terminated[pk] | state.data.truncated[pk]
        prior_done = jnp.cumsum(done_k.astype(jnp.int32), axis=1) - done_k
        continuing = ((prior_done == 0) & valid).astype(jnp.float32)
        gammas = self.gamma ** ks.astype(jnp.float32)
        reward_n = jnp.sum(r_k * gammas[None, :] * continuing, axis=1)
        m = jnp.sum(continuing, axis=1).astype(jnp.int32)  # ≥ 1 (k=0 valid)
        p_last = (idx + (m - 1) * self.stride) % self.capacity
        return TransitionBatch(
            obs=picked.obs,
            act=picked.act,
            next_obs=jax.tree.map(lambda s: s[p_last], state.data.next_obs),
            reward=reward_n,
            terminated=state.data.terminated[p_last],
            truncated=state.data.truncated[p_last],
            weight=weight,
            ix_sample=idx,
            discount=self.gamma ** m.astype(jnp.float32),
        )

    # -- priority feedback (≙ update_priority, base.rs:413-426) ------------
    def update_priority(
        self, state: ReplayBufferState, ix_sample: jax.Array, td_err: jax.Array
    ) -> ReplayBufferState:
        if self.per is None:
            return state
        p = (jnp.abs(td_err) + self.per.eps) ** self.per.alpha
        return state.replace(tree=self.tree.update(state.tree, ix_sample, p))

    # -- diagnostics (≙ whole_actions/num_terminated_flags/sum_rewards) ----
    def diagnostics(self, state: ReplayBufferState):
        valid = jnp.arange(self.capacity) < state.size
        return {
            "num_terminated": jnp.sum(
                jnp.where(valid, state.data.terminated, False)
            ),
            "sum_rewards": jnp.sum(jnp.where(valid, state.data.reward, 0.0)),
            "size": state.size,
        }
