"""Vectorized device-side sum tree for prioritized experience replay.

Re-derivation of the reference's pointer-walking SumTree
(border-core/src/generic_replay_buffer/base/sum_tree.rs:21-174) as a flat
heap array living in HBM, with *batched* updates and *batched* prefix-sum
descent — the pointer chase becomes log2(capacity) rounds of vectorized
gathers, which XLA maps well.

Layout: ``tree[2 * capacity]`` float32 (capacity is a power of two).
``tree[1]`` is the root (total mass), leaves live at
``tree[capacity + i]``.  ``tree[0]`` is unused.  Stored leaf values are the
*already-exponentiated* priorities ``p = (|td| + eps)^alpha``, matching the
reference which stores ``p^alpha`` directly (sum_tree.rs:75-96).

A min-tree of the same shape supports the "normalize over All" importance
weight option ``w_i = (N·P(i))^{-β} / max_j w_j`` where the max weight comes
from the minimum priority (sum_tree.rs:116-156).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@struct.dataclass
class SumTreeState:
    sum_tree: jax.Array  # [2 * cap] f32, internal nodes are subtree sums
    min_tree: jax.Array  # [2 * cap] f32, internal nodes are subtree mins
    max_priority: jax.Array  # running max of raw (exponentiated) priorities


class SumTree:
    """Static-config companion of :class:`SumTreeState` (pure methods)."""

    def __init__(self, capacity: int):
        self.capacity = _next_pow2(capacity)
        self.depth = self.capacity.bit_length() - 1  # log2(capacity)

    def init(self) -> SumTreeState:
        return SumTreeState(
            sum_tree=jnp.zeros(2 * self.capacity, jnp.float32),
            min_tree=jnp.full(2 * self.capacity, jnp.inf, jnp.float32),
            max_priority=jnp.float32(1.0),
        )

    def update(
        self, state: SumTreeState, indices: jax.Array, priorities: jax.Array
    ) -> SumTreeState:
        """Batched leaf write + bottom-up recompute (≙ sum_tree.rs update).

        Handles duplicate indices correctly: each level recomputes parents
        from both children (idempotent), rather than adding deltas.

        A zero priority marks a DEAD leaf (used by FrameReplayBuffer's
        residency maintenance): it gets no sampling mass and is excluded
        from the min tree (entered as +inf, like an unwritten leaf) so it
        cannot distort the normalize-over-All importance-weight maximum.
        Live priorities are always > 0 ((|td|+eps)^α and the max-priority
        insertions), so the encoding is unambiguous.
        """
        priorities = priorities.astype(jnp.float32)
        leaves = indices + self.capacity
        sum_t = state.sum_tree.at[leaves].set(priorities)
        min_t = state.min_tree.at[leaves].set(
            jnp.where(priorities > 0, priorities, jnp.inf)
        )

        def level(carry, _):
            sum_t, min_t, nodes = carry
            parents = nodes // 2
            left = 2 * parents
            right = left + 1
            sum_t = sum_t.at[parents].set(sum_t[left] + sum_t[right])
            min_t = min_t.at[parents].set(jnp.minimum(min_t[left], min_t[right]))
            return (sum_t, min_t, parents), None

        (sum_t, min_t, _), _ = jax.lax.scan(
            level, (sum_t, min_t, leaves), None, length=self.depth
        )
        return SumTreeState(
            sum_tree=sum_t,
            min_tree=min_t,
            max_priority=jnp.maximum(state.max_priority, jnp.max(priorities)),
        )

    def total(self, state: SumTreeState) -> jax.Array:
        return state.sum_tree[1]

    def min_priority(self, state: SumTreeState) -> jax.Array:
        return state.min_tree[1]

    def sample(
        self, state: SumTreeState, key: jax.Array, batch_size: int
    ) -> jax.Array:
        """Stratified prefix-sum inversion (≙ sum_tree.rs sample/get).

        Draws one mass point per stratum of total/batch_size, then descends
        the heap: all batch lanes walk one level per iteration.
        """
        total = self.total(state)
        bins = (jnp.arange(batch_size, dtype=jnp.float32) + jax.random.uniform(
            key, (batch_size,), jnp.float32
        )) * (total / batch_size)

        def descend(carry, _):
            nodes, mass = carry
            left = 2 * nodes
            left_sum = state.sum_tree[left]
            go_right = mass >= left_sum
            nodes = jnp.where(go_right, left + 1, left)
            mass = jnp.where(go_right, mass - left_sum, mass)
            return (nodes, mass), None

        (nodes, _), _ = jax.lax.scan(
            descend,
            (jnp.ones(batch_size, jnp.int32), bins),
            None,
            length=self.depth,
        )
        return nodes - self.capacity

    def weights(
        self,
        state: SumTreeState,
        indices: jax.Array,
        n_valid: jax.Array,
        beta: jax.Array,
        normalize_all: bool = True,
    ) -> jax.Array:
        """Importance weights ``(N·P(i))^{-β}``, normalized by the max weight
        over All (via min-tree) or over the Batch (≙ sum_tree.rs:116-156)."""
        total = jnp.maximum(self.total(state), 1e-12)
        p = state.sum_tree[indices + self.capacity] / total
        w = (n_valid.astype(jnp.float32) * jnp.maximum(p, 1e-12)) ** (-beta)
        if normalize_all:
            p_min = jnp.maximum(self.min_priority(state), 1e-12) / total
            w_max = (n_valid.astype(jnp.float32) * p_min) ** (-beta)
        else:
            w_max = jnp.max(w)
        return (w / jnp.maximum(w_max, 1e-12)).astype(jnp.float32)
