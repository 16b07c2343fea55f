"""Frame-deduplicated replay for stacked-frame pixel envs.

The reference stores full 4-frame stacks per transition twice (obs +
next_obs: TensorBatch [capacity, 4, 84, 84] ×2,
border-tch-agent/src/tensor_batch.rs:42-127) — at ALE scale (262,144
transitions, dqn_atari_async_tch/src/config.rs:59-65) that is ~15 GB and
does not fit v5e HBM.  This buffer stores each 84×84 frame ONCE and
reconstructs both stacks at sample time by gathering 4 consecutive frames
per sample — 8× less HBM and 8× less sampling bandwidth.

Layout: per-env columns ``frames[num_envs, capacity, 84, 84]`` — vectorized
envs push in lockstep, so one scalar write cursor (absolute step count)
serves all columns and each env's timeline stays contiguous in its ring.

Stack reconstruction at absolute step ``s`` of env ``e``:
``obs[k] = frames[e, (s - min(3-k, age[e,s])) % cap]`` — the ``age`` clamp
replays the episode's first frame for under-filled stacks, exactly matching
the env-side reset behavior (repeat of the initial frame,
border_tpu.envs.pixel.PixelEnv.reset_env ≙ env.rs:189-199's ring init).
The next-obs stack uses the ``s+1`` window; at terminated boundaries its
content belongs to the next episode, which is safe because the TD target
masks it with ``γ·(1−terminated)`` (dqn/base.rs:91-105 uses only
is_terminated).  Truncated-boundary next stacks are approximated by the
reset frame (rare: one transition per 27k-frame cap).

Sampling is uniform by default (the reference's Atari configs also run
PER-less: ``per_config: None``); samples are drawn from absolute steps
``[total − size + 4, total − 1)`` so every gathered window is resident.

Optional PER (``per=PerConfig()``): a device sum tree
(border_tpu.replay.sum_tree, ≙ sum_tree.rs:21-174) over the
``num_envs × capacity`` (env × slot) leaf space.  Residency is encoded as
priority: a slot enters the tree (at the running max priority,
≙ sum_tree.rs add) only once its full sample window exists — frame stack
behind it, ``n_step`` successors ahead — and every push zeroes the slots
whose windows the new write invalidates (the overwritten slot and the
``stack−1`` slots after it, whose stacks would cross the overwrite
point).  The prefix-sum descent therefore never lands on a non-resident
transition, with no rejection step.

Performance note: ``sample`` is designed to run INSIDE a jit-fused
training loop (the Trainer's update scan), where XLA fuses the frame
gather with its CNN consumer — measured ~free next to the batch-512
update (2 ms).  A standalone ``jit(sample)`` call materializes the
gather unfused and costs ~50 ms at the Pong bench shapes (with either
gather backend); don't build per-call host loops around it.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from border_tpu.replay.buffer import PerConfig, TransitionBatch
from border_tpu.replay.sum_tree import SumTree, SumTreeState


@struct.dataclass
class FrameReplayState:
    # [N, cap, R, 128] uint8 — frame observed BEFORE acting, flattened and
    # zero-padded to (R, 128) so each frame is a tile-aligned unit: XLA's
    # gather moves whole (R,128) tiles, and the optional Pallas path
    # (border_tpu.ops.gather_frames) DMAs the same units (Mosaic requires
    # (8·k, 128) slice shapes).  R·128 ≥ H·W, R ≡ 0 (mod 8); for 84×84
    # that is R=56 → 1.6 % padding overhead.
    frames: jax.Array
    act: jax.Array  # [N, cap] int32
    reward: jax.Array  # [N, cap] f32
    terminated: jax.Array  # [N, cap] bool
    truncated: jax.Array  # [N, cap] bool
    age: jax.Array  # [N, cap] int32 — step index within the episode
    total: jax.Array  # scalar int32: absolute steps pushed per env
    tree: Optional[SumTreeState] = None  # PER over (env × slot) leaves


class FrameReplayBuffer:
    """Drop-in replay for the Trainer: same sample() -> TransitionBatch API.

    ``capacity`` is per-env (global capacity = num_envs × capacity).
    """

    def __init__(
        self,
        capacity: int,
        num_envs: int,
        frame_hw: Tuple[int, int] = (84, 84),
        stack: int = 4,
        n_step: int = 1,
        gamma: float = 0.99,
        use_pallas: Optional[Any] = None,
        per: Optional[PerConfig] = None,
        sample_mode: str = "union",
        slice_group: int = 64,
        sort_samples: bool = False,
    ):
        """``n_step > 1`` enables n-step backups: sampled batches carry
        ``reward = Σ γ^k r_{t+k}`` (stopped at the first episode boundary),
        ``next_obs`` from t+m, and ``discount = γ^m`` — the n>1 extension
        the reference documents but never implements
        (border-core/src/base/batch.rs:19-23).

        ``use_pallas``: None/False (default) uses the XLA gather, which
        fuses with its consumers inside the fused update scan — measured
        1049 vs 992 b512-eq updates/s against the Pallas kernel there
        (artifacts/update_variants_r4_opts2.json).  The kernel wins for
        STANDALONE gathers (1.38× at 7 KB frames, sweep in
        artifacts/frame_gather_sweep.json) — set True for unfused use;
        ``"interpret"`` runs it in interpreter mode (CPU testing).

        ``sample_mode``: "union" (default — ONE ascending stack+1-width
        gather shared by obs/next_obs: 5/8 the HBM bytes, measured +9%
        end-to-end updates/s on the v5e bench shape), "separate" (two
        stack-width gathers — the reference-shaped fallback), or "slice"
        (below).  1-step only for union/slice; per-sample VALUES are
        identical across all three (equivalence-tested).

        ``sample_mode="slice"``: replaces the random per-(env,slot)
        gather with streaming reads.  MEASURED GUIDANCE (v5e bench
        shape, ARCHITECTURE.md round 5): inside the fused update scan
        this mode LOSES to the default union gather (best 906 vs 1030
        b512-eq updates/s, artifacts/update_variants_r5_slice.json) —
        XLA fuses the gather into its conv consumers while the
        slice+concat+clamp chain materializes the window first.  It
        remains the right shape where that fusion does not exist
        (standalone sampling, CPU meshes, very large frames), and its
        learning behavior is certified (pong_slice curve, 20.5 median).
        A batch is drawn as ``batch_size //
        slice_group`` independent groups; each group picks one absolute
        step s (uniform over the same draw range as uniform sampling) and
        one aligned block of ``slice_group`` consecutive env columns
        (uniform over blocks), then reads the whole
        ``[slice_group, stack+1]`` frame window with ONE
        ``lax.dynamic_slice`` — a contiguous HBM stream.  The ring is
        stored with ``stack+n_step`` mirror slots (push writes slot p and,
        for p < pad, slot cap+p) so windows never wrap and every slice is
        contiguous; the per-sample age clamp is applied afterwards as
        stack+1 fusable selects over the window axis (no gather).

        Sampling distribution: each transition's MARGINAL probability is
        uniform over the same (env, step) support as ``"union"``; within a
        batch, samples are stratified into ``batch_size/slice_group``
        (step, env-block) groups — group-mates share a timestep but come
        from INDEPENDENT env instances (distinct episodes), the same
        decorrelation argument that batches parallel-env on-policy data.
        Replay's temporal decorrelation across updates is preserved: every
        update draws fresh random steps.  Not available with PER or
        n_step>1 (those keep the gather path)."""
        self.capacity = capacity
        self.num_envs = num_envs
        self.frame_hw = frame_hw
        self.stack = stack
        self.n_step = n_step
        self.gamma = gamma
        self.use_pallas = use_pallas
        if sample_mode not in ("separate", "union", "slice"):
            raise ValueError(f"sample_mode must be 'separate', 'union' or "
                             f"'slice', got {sample_mode!r}")
        if sample_mode == "slice":
            if per is not None:
                raise ValueError("sample_mode='slice' is uniform-only; "
                                 "PER needs the per-leaf gather path")
            if n_step != 1:
                raise ValueError("sample_mode='slice' supports n_step=1 "
                                 "only (like 'union')")
            if num_envs % slice_group:
                raise ValueError(
                    f"slice_group ({slice_group}) must divide num_envs "
                    f"({num_envs})")
        self.sample_mode = sample_mode
        self.slice_group = slice_group
        # sort_samples: reorder each uniform batch's draws ascending in
        # (env, slot) before gathering — a batch is a SET (same multiset
        # of iid draws, uniform weights), so this is semantics-free; it
        # gives the replay gather monotone HBM addresses
        self.sort_samples = sort_samples
        # mirror pad: windows of stack+n_step slots never wrap the ring
        self.slot_pad = stack + n_step if sample_mode == "slice" else 0
        self.per = per
        self.tree = SumTree(num_envs * capacity) if per is not None else None
        if self.tree is not None:
            if self.tree.capacity != num_envs * capacity:
                raise ValueError(
                    "PER requires num_envs × capacity to be a power of two "
                    f"(got {num_envs * capacity}; next is {self.tree.capacity})"
                )
            if capacity <= stack + n_step:
                # also keeps the per-push activation slot (p − n_step) from
                # colliding with the invalidation slots (p .. p+stack−1)
                raise ValueError(
                    "PER needs capacity > stack + n_step "
                    f"(got {capacity} ≤ {stack} + {n_step})"
                )
        # tile-aligned flat frame layout (see FrameReplayState.frames)
        hw = frame_hw[0] * frame_hw[1]
        rows = -(-hw // 128)  # ceil
        self.frame_rows = -(-rows // 8) * 8  # round up to sublane multiple
        self.frame_pad = self.frame_rows * 128 - hw

    def with_num_envs(self, num_envs: int) -> "FrameReplayBuffer":
        """A copy configured for ``num_envs`` env columns — used by
        :class:`border_tpu.parallel.ShardedTrainer` to build per-device
        replay shards of ``num_envs / n_devices`` columns each (global
        capacity is unchanged: shards partition the env axis)."""
        return FrameReplayBuffer(
            capacity=self.capacity,
            num_envs=num_envs,
            frame_hw=self.frame_hw,
            stack=self.stack,
            n_step=self.n_step,
            gamma=self.gamma,
            use_pallas=self.use_pallas,
            per=self.per,
            sample_mode=self.sample_mode,
            slice_group=min(self.slice_group, num_envs),
            sort_samples=self.sort_samples,
        )

    def init(self, example=None) -> FrameReplayState:
        n, cap = self.num_envs, self.capacity + self.slot_pad
        return FrameReplayState(
            frames=jnp.zeros((n, cap, self.frame_rows, 128), jnp.uint8),
            act=jnp.zeros((n, cap), jnp.int32),
            reward=jnp.zeros((n, cap), jnp.float32),
            terminated=jnp.zeros((n, cap), bool),
            truncated=jnp.zeros((n, cap), bool),
            age=jnp.zeros((n, cap), jnp.int32),
            total=jnp.int32(0),
            tree=self.tree.init() if self.tree is not None else None,
        )

    # -- ingest (step-processor + push fused; ≙ SimpleStepProcessor,
    #    border-core/src/generic_replay_buffer/step_proc.rs:37-138) --------
    def process_step(
        self, state: FrameReplayState, prev_obs, action, ts, prev_ep_len
    ) -> FrameReplayState:
        """Push one lockstep vec-env transition.

        prev_obs: [N, H, W, stack] uint8 (stack's last channel = current
        frame); ts: Timestep; prev_ep_len: [N] steps already taken this
        episode (0 right after reset).
        """
        p = state.total % self.capacity
        frame = prev_obs[..., -1].reshape(self.num_envs, -1)
        frame = jnp.pad(frame, ((0, 0), (0, self.frame_pad)))
        frame = frame.reshape(self.num_envs, self.frame_rows, 128)
        tree = state.tree
        if self.tree is not None:
            tree = self._tree_push(state, p)
        frames = state.frames.at[:, p].set(frame)
        if self.slot_pad:
            # mirror the first ``slot_pad`` ring slots past the end so
            # slice-mode windows never wrap; a p ≥ slot_pad push rewrites
            # its own slot (same bytes — keeps the write shape static)
            p2 = jnp.where(p < self.slot_pad, p + self.capacity, p)
            frames = frames.at[:, p2].set(frame)
        return state.replace(
            frames=frames,
            act=state.act.at[:, p].set(action.astype(jnp.int32)),
            reward=state.reward.at[:, p].set(ts.reward.astype(jnp.float32)),
            terminated=state.terminated.at[:, p].set(ts.terminated),
            truncated=state.truncated.at[:, p].set(ts.truncated),
            age=state.age.at[:, p].set(prev_ep_len.astype(jnp.int32)),
            total=state.total + 1,
            tree=tree,
        )

    def _tree_push(self, state: FrameReplayState, p) -> SumTreeState:
        """Per-push PER residency maintenance, one batched tree update:

        - zero slots ``p .. p+stack−1`` for every env: ``p`` holds the new
          (still windowless) step, and the stacks of the ``stack−1`` slots
          after it now cross the overwrite point,
        - activate step ``total − n_step`` (its whole window just became
          resident) at the running max priority — ≙ SumTree::add's
          max-priority insertion (sum_tree.rs).
        """
        cap = self.capacity
        env_base = jnp.arange(self.num_envs, dtype=jnp.int32)[:, None] * cap
        kill = (p + jnp.arange(self.stack, dtype=jnp.int32)[None, :]) % cap
        kill_g = (env_base + kill).reshape(-1)  # [N·stack]
        s_act = state.total - self.n_step  # newest fully-windowed step
        act_g = (env_base[:, 0] + (s_act % cap)).astype(jnp.int32)  # [N]
        # the first `stack` steps of the run stay out, matching the uniform
        # draw range lo = total − size + stack
        act_p = jnp.where(
            s_act >= self.stack, state.tree.max_priority, 0.0
        ) * jnp.ones((self.num_envs,), jnp.float32)
        indices = jnp.concatenate([kill_g, act_g])
        priorities = jnp.concatenate(
            [jnp.zeros_like(kill_g, jnp.float32), act_p]
        )
        return self.tree.update(state.tree, indices, priorities)

    @property
    def size_attr(self):
        return "total"

    def fill(self, state: FrameReplayState) -> jax.Array:
        """Sampleable transitions currently resident (global count).

        Matches ``sample``'s draw range ``[lo, hi)`` exactly: per env the
        range spans ``size − stack − n_step`` steps, so warmup cannot pass
        while samples would still land on unwritten zero frames
        (≙ warmup semantics of border-core/src/trainer.rs:197-228)."""
        size = jnp.minimum(state.total, self.capacity)
        per_env = jnp.maximum(size - self.stack - self.n_step, 0)
        return per_env * self.num_envs

    # -- sampling ----------------------------------------------------------
    def _gather_rows(self, state, e, idx):
        """frames[e, idx] → [B, K, H, W] (K = idx.shape[1])."""
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = False  # XLA gather ~7 % faster end-to-end on v5e
        if use_pallas:
            from border_tpu.ops import gather_frames

            flat = state.frames.reshape((-1,) + state.frames.shape[2:])
            # stride by the STORED slot count (≥ capacity when the slice
            # mode's mirror pad is active; idx < capacity always)
            flat_idx = (
                e[:, None].astype(jnp.int32) * state.frames.shape[1] + idx
            )
            g = gather_frames(
                flat, flat_idx, interpret=(use_pallas == "interpret")
            )  # [B, K, R, 128]
        else:
            g = state.frames[e[:, None], idx]  # [B, K, R, 128]
        b, k = g.shape[:2]
        h, w = self.frame_hw
        return g.reshape(b, k, -1)[:, :, : h * w].reshape(b, k, h, w)

    def _gather_stack(self, state, e, s_abs, ages):
        """frames[e, window(s_abs)] → [B, H, W, stack]."""
        ks = jnp.arange(self.stack)  # 0..3, oldest→newest
        back = self.stack - 1 - ks  # 3..0
        # clamp window into the episode: replay first frame when short
        s_k = s_abs[:, None] - jnp.minimum(back[None, :], ages[:, None])
        idx = (s_k % self.capacity).astype(jnp.int32)
        g = self._gather_rows(state, e, idx)
        return jnp.moveaxis(g, 1, -1)  # [B, H, W, stack]

    def _gather_union(self, state, e, s_abs, ages):
        """(obs, next_obs) for 1-step samples via ONE union gather.

        The obs window (base ``s``) and next_obs window (base ``s+1``)
        share ``stack-1`` frames, so gathering the stack+1-frame union
        once moves 5/8 of the HBM bytes of two separate stack gathers.
        Positions are gathered OLDEST→NEWEST so both stacks are plain
        contiguous slices (obs = u[:, :stack], next = u[:, 1:]) — no
        negative-stride reversal copies.  Frame identity under age
        clamping: obs frame k = (s+1) − min(stack−k, age+1) = u_k and
        next frame k = (s+1) − min(stack−1−k, age+1) = u_{k+1}
        (min(a,b)+1 = min(a+1,b+1) lines the clamps up exactly).

        Ordering matters: a DESCENDING union (reversal slices for the
        two stacks) measured 565 b512-eq updates/s vs 891 for separate
        gathers (negative-stride copies); this ascending version measures
        971 — the default (r4 audit, update_variants_inscan_steady)."""
        js = jnp.arange(self.stack + 1)  # 0 = oldest .. stack = newest (s+1)
        s_j = (s_abs + 1)[:, None] - jnp.minimum(
            (self.stack - js)[None, :], (ages + 1)[:, None]
        )
        idx = (s_j % self.capacity).astype(jnp.int32)
        g = self._gather_rows(state, e, idx)  # [B, stack+1, H, W]
        obs = jnp.moveaxis(g[:, : self.stack], 1, -1)
        next_obs = jnp.moveaxis(g[:, 1:], 1, -1)
        return obs, next_obs

    def _gather_slice(self, state, s_g, e0, ages):
        """Streaming union windows (``sample_mode="slice"``): ONE
        ``dynamic_slice`` per (step, env-block) group reads the whole
        ``[slice_group, stack+1]`` frame window as a contiguous HBM
        stream (the mirror pad guarantees no ring wrap), then the
        per-sample age clamp is applied as ``stack+1`` selects over the
        window axis — value-identical to :meth:`_gather_union` (same
        clamp algebra), with no gather HLO anywhere."""
        S, G, cap = self.stack, self.slice_group, self.capacity
        w0 = ((s_g - (S - 1)) % cap).astype(jnp.int32)
        u = jnp.concatenate([
            jax.lax.dynamic_slice(
                state.frames,
                (e0[g], w0[g], 0, 0),
                (G, S + 1, self.frame_rows, 128),
            )
            for g in range(s_g.shape[0])
        ], axis=0)  # [B, S+1, R, 128], ascending (oldest → s+1)
        # age clamp via the union algebra's closed form: the clamped
        # window is u'_j = u[max(j, c)] with c = max(S−1−age, 0) — i.e.
        # the first c positions repeat the episode's first frame u_c.
        # ONE select pass over the window (plus a tiny per-sample
        # single-frame gather for u_c) — both stacks are then plain
        # contiguous slices of u', exactly like the union gather's
        # consumption (a per-position 5-way select was measured 15 %
        # SLOWER end-to-end than the gather it replaced: it reads the
        # window once per candidate; this form reads it once, total)
        c = jnp.maximum(S - 1 - ages, 0).astype(jnp.int32)  # [B]
        u_c = jnp.take_along_axis(u, c[:, None, None, None], axis=1)
        js = jnp.arange(S + 1, dtype=jnp.int32)
        u = jnp.where(
            js[None, :, None, None] < c[:, None, None, None], u_c, u
        )
        h, w = self.frame_hw

        def to_hw(g):
            b, k = g.shape[:2]
            g = g.reshape(b, k, -1)[:, :, : h * w].reshape(b, k, h, w)
            return jnp.moveaxis(g, 1, -1)  # [B, H, W, S]

        return to_hw(u[:, :S]), to_hw(u[:, 1:])

    def sample(
        self,
        state: FrameReplayState,
        key: jax.Array,
        batch_size: int,
        n_opts: Optional[jax.Array] = None,
    ) -> TransitionBatch:
        size = jnp.minimum(state.total, self.capacity)
        if self.sample_mode == "slice":
            G = self.slice_group
            if batch_size % G:
                raise ValueError(
                    f"slice_group ({G}) must divide batch_size "
                    f"({batch_size})")
            k_e, k_s = jax.random.split(key)
            lo = state.total - size + self.stack
            hi = jnp.maximum(state.total - self.n_step, lo + 1)
            s_g = jax.random.randint(k_s, (batch_size // G,), lo, hi)
            e0 = (G * jax.random.randint(
                k_e, (batch_size // G,), 0, self.num_envs // G
            )).astype(jnp.int32)
            e = (e0[:, None] + jnp.arange(G, dtype=jnp.int32)[None, :]
                 ).reshape(-1)
            s = jnp.repeat(s_g, G)
            p = (s % self.capacity).astype(jnp.int32)
            ages = state.age[e, p]
            obs, next_obs = self._gather_slice(state, s_g, e0, ages)
            return TransitionBatch(
                obs=obs,
                act=state.act[e, p],
                next_obs=next_obs,
                reward=state.reward[e, p],
                terminated=state.terminated[e, p],
                truncated=state.truncated[e, p],
                weight=jnp.ones((batch_size,), jnp.float32),
                ix_sample=e * self.capacity + p,
            )
        if self.per is not None:
            # prioritized draw over (env × slot) leaves; residency is
            # guaranteed by the zero-priority maintenance in _tree_push
            g = self.tree.sample(state.tree, key, batch_size)
            e = (g // self.capacity).astype(jnp.int32)
            p_leaf = (g % self.capacity).astype(jnp.int32)
            # most recent absolute step congruent to this slot
            s = (state.total - 1) - ((state.total - 1 - p_leaf) % self.capacity)
            beta = self.per.beta(
                n_opts if n_opts is not None else jnp.int32(0)
            )
            weight = self.tree.weights(
                state.tree, g, self.fill(state), beta, self.per.normalize_all
            )
        else:
            k_e, k_s = jax.random.split(key)
            e = jax.random.randint(k_e, (batch_size,), 0, self.num_envs)
            lo = state.total - size + self.stack
            hi = jnp.maximum(state.total - self.n_step, lo + 1)
            s = jax.random.randint(k_s, (batch_size,), lo, hi)
            if self.sort_samples:
                order = jnp.argsort(
                    e * self.capacity + (s % self.capacity)
                )
                e, s = e[order], s[order]
            weight = jnp.ones((batch_size,), jnp.float32)

        p = (s % self.capacity).astype(jnp.int32)
        ages = state.age[e, p]

        if self.n_step == 1:
            if self.sample_mode == "union":
                obs, next_obs = self._gather_union(state, e, s, ages)
            else:
                obs = self._gather_stack(state, e, s, ages)
                next_obs = self._gather_stack(state, e, s + 1, ages + 1)
            return TransitionBatch(
                obs=obs,
                act=state.act[e, p],
                next_obs=next_obs,
                reward=state.reward[e, p],
                terminated=state.terminated[e, p],
                truncated=state.truncated[e, p],
                weight=weight,
                ix_sample=e * self.capacity + p,
            )

        # --- n-step accumulation, stopped at the first episode boundary
        obs = self._gather_stack(state, e, s, ages)
        ks = jnp.arange(self.n_step)  # [n]
        pk = ((s[:, None] + ks[None, :]) % self.capacity).astype(jnp.int32)
        r_k = state.reward[e[:, None], pk]  # [B, n]
        done_k = (
            state.terminated[e[:, None], pk] | state.truncated[e[:, None], pk]
        )
        # continuing[b, k] = no boundary strictly before step k
        prior_done = jnp.cumsum(done_k.astype(jnp.int32), axis=1) - done_k
        continuing = (prior_done == 0).astype(jnp.float32)
        gammas = self.gamma ** ks.astype(jnp.float32)
        reward_n = jnp.sum(r_k * gammas[None, :] * continuing, axis=1)
        m = jnp.sum(continuing, axis=1).astype(jnp.int32)  # steps taken ≤ n
        p_last = ((s + m - 1) % self.capacity).astype(jnp.int32)
        next_obs = self._gather_stack(state, e, s + m, ages + m)
        return TransitionBatch(
            obs=obs,
            act=state.act[e, p],
            next_obs=next_obs,
            reward=reward_n,
            terminated=state.terminated[e, p_last],
            truncated=state.truncated[e, p_last],
            weight=weight,
            ix_sample=e * self.capacity + p,
            discount=self.gamma ** m.astype(jnp.float32),
        )

    def update_priority(self, state, ix_sample, td_err):
        """|td|^α priority feedback (≙ update_priority, base.rs:413-426);
        no-op when uniform."""
        if self.per is None:
            return state
        p = (jnp.abs(td_err) + self.per.eps) ** self.per.alpha
        return state.replace(
            tree=self.tree.update(state.tree, ix_sample, p)
        )

    def diagnostics(self, state: FrameReplayState):
        size = jnp.minimum(state.total, self.capacity)
        valid = jnp.arange(self.capacity)[None, :] < size
        return {
            "num_terminated": jnp.sum(jnp.where(valid, state.terminated, False)),
            "sum_rewards": jnp.sum(jnp.where(valid, state.reward, 0.0)),
            "size": size * self.num_envs,
        }
