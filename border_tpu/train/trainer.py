"""Synchronous trainer: the whole loop body fused into one XLA program.

≙ border-core Trainer (trainer.rs:76-385).  The reference's per-step loop

    Sampler::sample_and_push → Trainer::train_step → post_process
    (trainer.rs:267-327, sampler.rs:99-144)

runs one env step and at most one opt round per iteration, crossing the
Rust↔CPython and Rust↔libtorch boundaries each time.  Here the same loop
body compiles into a single jitted *chunk*:

    lax.scan over K env steps  (num_envs vectorized instances, push to HBM)
    lax.scan over M updates    (sample from HBM, fused grad/optimizer step)

with M chosen so the update:transition ratio matches the reference's
``opt_interval`` / ``n_updates_per_opt`` knobs exactly (SURVEY.md §7
"Update:sample ratio control"): M = K·num_envs/opt_interval · n_updates_per_opt.

The Python shell around the chunk only handles cadences — warmup on buffer
fill (trainer.rs:197-228), periodic evaluation with best-model selection
(post_process, trainer.rs:231-264), record flushing, and checkpoints — all at
chunk granularity.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from border_tpu.core.agent import Agent
from border_tpu.core.env import Environment, VecEnv
from border_tpu.record.record import Record
from border_tpu.record.recorder import NullRecorder, Recorder
from border_tpu.replay.buffer import ReplayBuffer, Transition
from border_tpu.train.config import TrainerConfig
from border_tpu.train.evaluator import Evaluator


def _reconcile_next_cadence(stored: int, interval: int, opt_steps: int):
    """Reconcile a restored cadence counter with the CURRENT config.

    The stored value is only meaningful while the feature stays enabled:
    interval=0 now means disabled (None) regardless of history; enabled
    now but disabled/unknown before (stored < 0) schedules the next
    firing one interval from the current position.  Keeps a zero
    interval out of the advance arithmetic entirely."""
    if not interval:
        return None
    if stored < 0:
        return opt_steps + interval
    return max(stored, opt_steps - opt_steps % interval)


@dataclasses.dataclass
class TrainResult:
    """Final states + throughput stats (≙ AsyncTrainStat,
    border-async-trainer/src/async_trainer/stat.rs:1-27)."""

    agent_state: Any
    buffer_state: Any
    env_steps: int
    opt_steps: int
    duration_sec: float
    samples_per_sec: float
    opt_per_sec: float
    best_score: float
    eval_history: List[Tuple[int, float]]


class Trainer:
    def __init__(
        self,
        env: Environment,
        agent: Agent,
        buffer: ReplayBuffer,
        config: TrainerConfig = TrainerConfig(),
        recorder: Optional[Recorder] = None,
        evaluator: Optional[Evaluator] = None,
        checkpoint_manager=None,
        checkpoint_interval: int = 0,
        eval_callback=None,
    ):
        self.env = env
        self.agent = agent
        self.buffer = buffer
        self.config = config
        self.recorder = recorder or NullRecorder()
        self.evaluator = evaluator
        # full-training-state snapshots (superset of the reference's
        # model-only saves — SURVEY.md §5.4); 0 disables
        self.checkpoint_manager = checkpoint_manager
        self.checkpoint_interval = checkpoint_interval
        # called after every evaluation with (opt_steps, env_steps, score,
        # best_score) — used by examples to stream learning-curve artifacts
        self.eval_callback = eval_callback
        self.vec = VecEnv(env, config.num_envs)

        c = config
        transitions_per_chunk = c.steps_per_chunk * c.num_envs
        self.updates_per_chunk = max(
            1, round(transitions_per_chunk / c.opt_interval)
        ) * c.n_updates_per_opt

        # n-step ReplayBuffers must know the ring stride between a given
        # env's consecutive transitions (= envs pushed per vec step per
        # device; ShardedTrainer overrides the expectation with its
        # per-device env count)
        self._check_nstep_stride(buffer, self._nstep_expected_stride())
        self._check_nstep_clip(agent, buffer)
        self._check_nstep_gamma(agent, buffer)

    def _nstep_expected_stride(self) -> int:
        return self.config.num_envs

    @staticmethod
    def _check_nstep_clip(agent, buffer) -> None:
        """clip_reward clips per-transition rewards; an n-step buffer's
        sampled reward is already the accumulated return, so clipping it
        would compute a different target than canonical n-step DQN (which
        clips each r_k before accumulation).  Reject the combination —
        clip at the env (sign-clip, envs/pixel.py) instead."""
        cfg = getattr(agent, "config", None)
        if (
            getattr(cfg, "clip_reward", None) is not None
            and getattr(buffer, "n_step", 1) > 1
        ):
            from border_tpu.errors import ConfigError

            raise ConfigError(
                "clip_reward with an n-step (n>1) replay buffer would clip "
                "the accumulated n-step return, not per-step rewards; "
                "clip rewards env-side instead"
            )

    @staticmethod
    def _check_nstep_gamma(agent, buffer) -> None:
        """With n_step>1 the buffer's gamma drives BOTH the n-step reward
        sum and ``batch.discount`` (which bootstrap_discount uses instead
        of the agent's gamma) — a silently different agent gamma would be
        dead configuration.  Require them to agree."""
        cfg = getattr(agent, "config", None)
        agent_gamma = getattr(cfg, "gamma", None)
        if (
            agent_gamma is not None
            and getattr(buffer, "n_step", 1) > 1
            and abs(float(getattr(buffer, "gamma", agent_gamma))
                    - float(agent_gamma)) > 1e-9
        ):
            from border_tpu.errors import ConfigError

            raise ConfigError(
                f"agent gamma ({agent_gamma}) != n-step buffer gamma "
                f"({buffer.gamma}); with n_step>1 the buffer's gamma "
                f"drives the n-step return and the bootstrap discount — "
                f"pass the same gamma to both"
            )

    @staticmethod
    def _check_nstep_stride(buffer, expected: int) -> None:
        if (
            isinstance(buffer, ReplayBuffer)
            and buffer.n_step > 1
            and buffer.stride != expected
        ):
            from border_tpu.errors import ConfigError

            raise ConfigError(
                f"n-step ReplayBuffer stride ({buffer.stride}) must equal "
                f"the envs pushed per vec step ({expected}) — ring "
                f"neighbors would belong to different envs otherwise"
            )

    # ------------------------------------------------------------------
    # fused chunk
    # ------------------------------------------------------------------
    def _env_scan(self, agent_state, vec_state, buf_state, key, explore: bool):
        """K env steps: act → step → push (≙ Sampler::sample_and_push,
        trainer/sampler.rs:99-144, batched over num_envs)."""

        def body(carry, k):
            agent_state, vec_state, buf_state = carry
            if explore:
                action = self.agent.select_action(agent_state, vec_state.obs, k)
            else:
                action = self.agent.select_action_eval(agent_state, vec_state.obs, k)
            prev_obs = vec_state.obs
            prev_ep_len = vec_state.episode_length
            ts, vec_state = self.vec.step(vec_state, action)
            buf_state = self.buffer.process_step(
                buf_state, prev_obs, action, ts, prev_ep_len
            )
            agent_state = self.agent.on_env_step(agent_state, self.config.num_envs)
            done_f = ts.done.astype(jnp.float32)
            stats = (
                jnp.sum(done_f * vec_state.last_return),
                jnp.sum(done_f),
            )
            return (agent_state, vec_state, buf_state), stats

        keys = jax.random.split(key, self.config.steps_per_chunk)
        (agent_state, vec_state, buf_state), (ep_ret, ep_cnt) = jax.lax.scan(
            body, (agent_state, vec_state, buf_state), keys
        )
        return agent_state, vec_state, buf_state, jnp.sum(ep_ret), jnp.sum(ep_cnt)

    def _update_scan(self, agent_state, buf_state, key):
        """M gradient steps: sample → update → priority feedback
        (≙ Agent::opt inner loop, dqn/base.rs:182-200).

        With uniform replay the sample for iteration i+1 is PREFETCHED
        inside iteration i's body: the gather has no data dependence on
        that iteration's gradient step, so XLA's scheduler overlaps the
        replay DMA with the MXU compute instead of serializing them —
        the r4 on-chip decomposition measured the two as purely additive
        in the naive ordering (update_fixed 0.64 ms + sample 0.42 ms,
        artifacts/update_decomposition.json).  PER keeps the sequential
        order: its sampling distribution depends on the priorities the
        previous update just wrote."""
        B = self.config.batch_size
        keys = jax.random.split(key, self.updates_per_chunk + 1)

        ups = self.config.updates_per_sample_batch
        if ups > 1 and self.buffer.per is None:
            if self.updates_per_chunk % ups:
                from border_tpu.errors import ConfigError

                raise ConfigError(
                    f"updates_per_sample_batch ({ups}) must divide the "
                    f"chunk's update count ({self.updates_per_chunk})"
                )

            def body(carry, k):
                agent_state = carry
                ks = jax.random.split(k, ups + 1)
                big = self.buffer.sample(
                    buf_state, ks[0], B * ups, n_opts=agent_state.n_opts
                )
                all_metrics = []
                for i in range(ups):
                    sub = jax.tree.map(
                        lambda x: x[i * B:(i + 1) * B], big
                    )
                    agent_state, metrics, _ = self.agent.update(
                        agent_state, sub, ks[1 + i]
                    )
                    all_metrics.append(metrics)
                return agent_state, jax.tree.map(
                    lambda *m: jnp.stack(m).mean(0), *all_metrics
                )

            agent_state, metrics = jax.lax.scan(
                body, agent_state, keys[1:1 + self.updates_per_chunk // ups],
                unroll=self.config.update_scan_unroll,
            )
            return agent_state, buf_state, jax.tree.map(jnp.mean, metrics)

        if self.buffer.per is None and self.config.prefetch_sample:
            batch0 = self.buffer.sample(
                buf_state, keys[0], B, n_opts=agent_state.n_opts
            )

            def body(carry, k):
                agent_state, batch = carry
                k_sample, k_update = jax.random.split(k)
                next_batch = self.buffer.sample(  # for iteration i+1
                    buf_state, k_sample, B, n_opts=agent_state.n_opts
                )
                agent_state, metrics, _ = self.agent.update(
                    agent_state, batch, k_update
                )
                return (agent_state, next_batch), metrics

            (agent_state, _), metrics = jax.lax.scan(
                body, (agent_state, batch0), keys[1:],
                unroll=self.config.update_scan_unroll,
            )
            return agent_state, buf_state, jax.tree.map(jnp.mean, metrics)

        def body(carry, k):
            agent_state, buf_state = carry
            k_sample, k_update = jax.random.split(k)
            batch = self.buffer.sample(
                buf_state, k_sample, self.config.batch_size, n_opts=agent_state.n_opts
            )
            agent_state, metrics, td_err = self.agent.update(
                agent_state, batch, k_update
            )
            if td_err is not None:
                buf_state = self.buffer.update_priority(
                    buf_state, batch.ix_sample, td_err
                )
            return (agent_state, buf_state), metrics

        (agent_state, buf_state), metrics = jax.lax.scan(
            body, (agent_state, buf_state), keys[1:],
            unroll=self.config.update_scan_unroll,
        )
        mean_metrics = jax.tree.map(jnp.mean, metrics)
        return agent_state, buf_state, mean_metrics

    @partial(jax.jit, static_argnums=(0, 5, 6))
    def _chunk(
        self, agent_state, vec_state, buf_state, key, do_update: bool,
        do_env: bool = True,
    ):
        k_env, k_upd = jax.random.split(key)
        if do_env:
            agent_state, vec_state, buf_state, ep_ret, ep_cnt = self._env_scan(
                agent_state, vec_state, buf_state, k_env, explore=True
            )
        else:
            ep_ret = jnp.float32(0.0)
            ep_cnt = jnp.float32(0.0)
        if do_update:
            agent_state, buf_state, metrics = self._update_scan(
                agent_state, buf_state, k_upd
            )
        else:
            metrics = {}
        return agent_state, vec_state, buf_state, metrics, ep_ret, ep_cnt

    def _dispatch(self, agent_state, vec_state, buffer_state, key, warmed):
        """One loop iteration's device work.  The base trainer runs the
        fused actor+learner chunk with the SAME params; AsyncTrainer
        overrides this with decoupled actor/learner phases (stale actor
        params refreshed every ``sync_interval``) while inheriting every
        cadence (eval, save, checkpoint/resume, compute-cost records)
        from :meth:`train` unchanged."""
        return self._chunk(agent_state, vec_state, buffer_state, key, warmed)

    # subclass checkpoint hooks: extra state that must survive a kill for
    # resume to be bit-exact (AsyncTrainer adds its stale actor params)
    def _checkpoint_extra(self, agent_state) -> dict:
        return {}

    def _restore_checkpoint_extra(self, ex: dict) -> None:
        pass

    # ------------------------------------------------------------------
    # state construction (overridden by ShardedTrainer for sharded init)
    # ------------------------------------------------------------------
    def init_states(self, k_agent: jax.Array, k_env: jax.Array):
        agent_state = self.agent.init(
            k_agent, self.vec.observation_space, self.vec.action_space
        )
        vec_state = self.vec.reset(k_env)
        obs0 = self.vec.observation_space.zero()
        act0 = self.vec.action_space.zero()
        example = Transition(
            obs=obs0,
            act=act0,
            next_obs=obs0,
            reward=jnp.float32(0.0),
            terminated=jnp.bool_(False),
            truncated=jnp.bool_(False),
        )
        buffer_state = self.buffer.init(example)
        return agent_state, vec_state, buffer_state

    def _buffer_fill(self, buffer_state) -> int:
        return int(self.buffer.fill(buffer_state))

    # ------------------------------------------------------------------
    # orchestration shell (≙ Trainer::train, trainer.rs:267-327)
    # ------------------------------------------------------------------
    def train(
        self,
        key: Optional[jax.Array] = None,
        agent_state: Optional[Any] = None,
        buffer_state: Optional[Any] = None,
        resume_from: Optional[Any] = None,
    ) -> TrainResult:
        """Run the training loop.

        ``resume_from``: a :class:`border_tpu.utils.CheckpointManager` whose
        latest full-state checkpoint (agent + buffer + env states, RNG key,
        loop counters) is restored before the loop starts — a resumed run
        continues bit-exactly where the checkpointed run left off (the
        reference loses everything but model params, SURVEY.md §5.4).
        ``eval_history`` in the result covers only post-resume evaluations.
        """
        c = self.config
        key = key if key is not None else jax.random.PRNGKey(c.seed)
        k_agent, k_env, k_loop = jax.random.split(key, 3)

        init_agent, vec_state, init_buffer = self.init_states(k_agent, k_env)
        if agent_state is None:
            agent_state = init_agent
        if buffer_state is None:
            buffer_state = init_buffer

        env_steps = 0  # transitions pushed (num_envs per vec step)
        opt_steps = 0
        best_score = -float("inf")
        eval_history: List[Tuple[int, float]] = []
        next_eval = c.eval_interval
        next_save = c.save_interval if c.save_interval else None
        next_flush = c.flush_record_interval

        # compute-cost cadence counter (restored on resume below)
        next_cost = c.record_compute_cost_interval

        if resume_from is not None:
            tmpl_extra = {
                "env_steps": 0, "opt_steps": 0, "best_score": 0.0,
                "next_eval": 0, "next_save": 0, "next_flush": 0,
                "next_ckpt": 0, "next_agent_info": 0, "next_cost": 0,
                **self._checkpoint_extra(agent_state),
            }
            restored = resume_from.restore(
                agent_state, buffer_state, vec_state, key=k_loop,
                extra=tmpl_extra,
            )
            agent_state = restored["agent_state"]
            buffer_state = restored["buffer_state"]
            vec_state = restored["vec_state"]
            k_loop = restored["key"]
            ex = restored["extra"]
            env_steps = int(ex["env_steps"])
            opt_steps = int(ex["opt_steps"])
            best_score = float(ex["best_score"])
            next_eval = int(ex["next_eval"])
            next_save = _reconcile_next_cadence(
                int(ex["next_save"]), c.save_interval, opt_steps
            )
            next_flush = int(ex["next_flush"])
            self._next_ckpt = int(ex["next_ckpt"])
            self._next_agent_info = int(ex["next_agent_info"])
            next_cost = int(ex["next_cost"])
            self._restore_checkpoint_extra(ex)

        t0 = time.perf_counter()
        # throughput rates cover only this invocation's work: counters may
        # start non-zero after a resume
        start_env_steps = env_steps
        start_opt_steps = opt_steps
        chunk_i = 0
        # compute-cost accumulators (≙ timer_for_opt_steps/timer_for_samples,
        # border-core/src/trainer.rs:163-174, reported every
        # record_compute_cost_interval opt steps at trainer.rs:304-310)
        cost_time = 0.0
        cost_updates = 0
        cost_transitions = 0

        while opt_steps < c.max_opts:
            chunk_i += 1
            k_loop, k_chunk = jax.random.split(k_loop)
            warmed = self._buffer_fill(buffer_state) >= max(
                c.warmup_period, c.batch_size
            )
            t_chunk = time.perf_counter()
            agent_state, vec_state, buffer_state, metrics, ep_ret, ep_cnt = (
                self._dispatch(agent_state, vec_state, buffer_state, k_chunk, warmed)
            )
            jax.block_until_ready(agent_state)
            dt = time.perf_counter() - t_chunk

            env_steps += c.steps_per_chunk * c.num_envs
            if warmed:
                opt_steps = int(agent_state.n_opts)

            # -- telemetry (≙ trainer.rs:305-320 record/store/flush) -------
            rec = Record({k: float(v) for k, v in metrics.items()})
            cnt = float(ep_cnt)
            if cnt > 0:
                rec["episode_return_train"] = float(ep_ret) / cnt
            rec["env_steps"] = float(env_steps)
            rec["samples_per_sec"] = c.steps_per_chunk * c.num_envs / dt
            if warmed:
                rec["opt_steps_per_sec"] = self.updates_per_chunk / dt
            self.recorder.store(rec)

            # -- compute-cost records every record_compute_cost_interval ---
            cost_time += dt
            cost_transitions += c.steps_per_chunk * c.num_envs
            if warmed:
                cost_updates += self.updates_per_chunk
            if c.record_compute_cost_interval and opt_steps >= next_cost:
                cost = Record(
                    {
                        "average_sample_time": 1e3 * cost_time / max(cost_transitions, 1)
                    }
                )
                if cost_updates:
                    cost["average_opt_time"] = 1e3 * cost_time / cost_updates
                self.recorder.write_at(cost, opt_steps)
                cost_time, cost_updates, cost_transitions = 0.0, 0, 0
                next_cost += c.record_compute_cost_interval

            if opt_steps >= next_flush:
                self.recorder.flush(opt_steps)
                next_flush += c.flush_record_interval

            # -- periodic per-tensor param stats (≙ param_stats records,
            #    border-tch-agent/src/util.rs:66-80, cadence
            #    record_agent_info_interval trainer/config.rs)
            if (
                c.record_agent_info_interval
                and warmed
                and opt_steps >= getattr(self, "_next_agent_info", 0)
            ):
                from border_tpu.agents.common import param_stats

                stats = param_stats(
                    self.agent.policy_params(agent_state), prefix="param/"
                )
                self.recorder.write_at(
                    Record({k: float(v) for k, v in stats.items()}), opt_steps
                )
                self._next_agent_info = opt_steps + c.record_agent_info_interval

            # -- evaluation + best-model (≙ post_process, trainer.rs:231-264)
            if self.evaluator is not None and opt_steps >= next_eval:
                score, eval_rec = self.evaluator.evaluate(
                    self.agent, agent_state, eval_index=len(eval_history)
                )
                eval_history.append((opt_steps, score))
                self.recorder.write_at(eval_rec, opt_steps)
                if score > best_score:
                    best_score = score
                    if self.recorder.model_dir is not None:
                        self.recorder.save_model("best", self.agent, agent_state)
                if self.eval_callback is not None:
                    self.eval_callback(opt_steps, env_steps, score, best_score)
                next_eval += c.eval_interval

            if next_save is not None and opt_steps >= next_save:
                if self.recorder.model_dir is not None:
                    self.recorder.save_model(str(opt_steps), self.agent, agent_state)
                # advance PAST the current opt count: a chunk crossing
                # several cadence points saves once and never falls behind
                next_save = opt_steps + c.save_interval

            if (
                self.checkpoint_manager is not None
                and self.checkpoint_interval
                and opt_steps >= getattr(self, "_next_ckpt", self.checkpoint_interval)
            ):
                self._next_ckpt = opt_steps + self.checkpoint_interval
                self.checkpoint_manager.save(
                    opt_steps,
                    agent_state,
                    buffer_state,
                    vec_state,
                    key=k_loop,
                    extra={
                        "env_steps": env_steps,
                        "opt_steps": opt_steps,
                        "best_score": best_score,
                        "next_eval": next_eval,
                        "next_save": -1 if next_save is None else next_save,
                        "next_flush": next_flush,
                        "next_ckpt": self._next_ckpt,
                        "next_agent_info": getattr(self, "_next_agent_info", 0),
                        "next_cost": next_cost,
                        **self._checkpoint_extra(agent_state),
                    },
                )

        duration = time.perf_counter() - t0
        self.recorder.flush(opt_steps)
        return TrainResult(
            agent_state=agent_state,
            buffer_state=buffer_state,
            env_steps=env_steps,
            opt_steps=opt_steps,
            duration_sec=duration,
            samples_per_sec=(env_steps - start_env_steps) / duration,
            opt_per_sec=(opt_steps - start_opt_steps) / duration,
            best_score=best_score,
            eval_history=eval_history,
        )
