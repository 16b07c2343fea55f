"""Decoupled actor-learner with periodic model sync (Border semantics).

≙ border-async-trainer's AsyncTrainer + Actor loop
(async_trainer/base.rs:58-389, actor/base.rs:120-178): actors sample with
*stale* policy params and refresh them every ``sync_interval`` optimizer
steps (sync at base.rs:267-272; actor-side check actor/base.rs:95-110).
Use this mode when the update:sample ratio must float freely from the env
throughput — the synchronous fused Trainer pins the ratio instead.

TPU mapping: the "channel" between actor and learner is the shared HBM
replay state; "model sync" is copying the learner's policy sub-pytree over
the actor's (``Agent.sync_policy`` ≙ SyncModel::sync_model,
border-async-trainer/src/sync_model.rs:1-13; NamedTensors payload
border-tch-agent/src/util/named_tensors.rs:5-36).  Actor phases and learner
phases alternate as two jitted programs over the same state; combined with
:class:`border_tpu.parallel.sharded.ShardedTrainer` the actor phase runs on
every device's env shard.

Emits ActorStat/AsyncTrainStat-equivalent throughput records
(actor/stat.rs:1-23, async_trainer/stat.rs:1-27).
"""

from __future__ import annotations

import time
from typing import Any, List, Optional, Tuple

import jax

from border_tpu.record.record import Record
from border_tpu.train.trainer import Trainer, TrainResult


class AsyncTrainer(Trainer):
    """Alternates sample chunks (stale params) and update bursts."""

    def train(
        self,
        key: Optional[jax.Array] = None,
        agent_state: Optional[Any] = None,
        buffer_state: Optional[Any] = None,
        vec_state: Optional[Any] = None,
    ) -> TrainResult:
        c = self.config
        key = key if key is not None else jax.random.PRNGKey(c.seed)
        k_agent, k_env, k_loop = jax.random.split(key, 3)

        # build only the states the caller did not supply (a resumed run
        # passes all three; the reference's AsyncTrainer always rebuilds —
        # async_trainer/base.rs:299-325)
        if agent_state is None or buffer_state is None or vec_state is None:
            init_agent, init_vec, init_buffer = self.init_states(k_agent, k_env)
            agent_state = agent_state if agent_state is not None else init_agent
            buffer_state = buffer_state if buffer_state is not None else init_buffer
            vec_state = vec_state if vec_state is not None else init_vec
        learner_state = agent_state

        # initial model sync broadcast (≙ async_trainer/base.rs:324-325)
        actor_params = self.agent.policy_params(learner_state)
        last_sync = 0

        env_steps = 0
        opt_steps = 0
        best_score = -float("inf")
        eval_history: List[Tuple[int, float]] = []
        next_eval = c.eval_interval
        next_flush = c.flush_record_interval
        t0 = time.perf_counter()

        while opt_steps < c.max_opts:
            k_loop, k_act, k_upd = jax.random.split(k_loop, 3)

            # --- actor phase: stale policy, no updates (actor/base.rs loop)
            actor_state = self.agent.sync_policy(learner_state, actor_params)
            t_a = time.perf_counter()
            actor_state, vec_state, buffer_state, _, ep_ret, ep_cnt = self._chunk(
                actor_state, vec_state, buffer_state, k_act, False, True
            )
            jax.block_until_ready(ep_cnt)
            dt_actor = time.perf_counter() - t_a
            env_steps += c.steps_per_chunk * c.num_envs
            # keep the learner's own params; adopt advanced counters
            learner_state = self.agent.sync_policy(
                actor_state, self.agent.policy_params(learner_state)
            )

            # --- learner phase (update_replay_buffer+train_step analogue)
            warmed = self._buffer_fill(buffer_state) >= max(
                c.warmup_period, c.batch_size
            )
            metrics = {}
            dt_opt = 0.0
            if warmed:
                t_o = time.perf_counter()
                learner_state, vec_state, buffer_state, metrics, _, _ = self._chunk(
                    learner_state, vec_state, buffer_state, k_upd, True, False
                )
                jax.block_until_ready(learner_state)
                dt_opt = time.perf_counter() - t_o
                opt_steps = int(learner_state.n_opts)

            # --- periodic model sync (base.rs:267-272)
            if opt_steps - last_sync >= c.sync_interval:
                actor_params = self.agent.policy_params(learner_state)
                last_sync = opt_steps

            rec = Record({k: float(v) for k, v in metrics.items()})
            cnt = float(ep_cnt)
            if cnt > 0:
                rec["episode_return_train"] = float(ep_ret) / cnt
            rec["env_steps"] = float(env_steps)
            rec["samples_per_sec"] = c.steps_per_chunk * c.num_envs / max(dt_actor, 1e-9)
            if warmed and dt_opt > 0:
                rec["opt_steps_per_sec"] = self.updates_per_chunk / dt_opt
                rec["average_opt_time_ms"] = 1e3 * dt_opt / self.updates_per_chunk
                rec["average_sample_time_ms"] = (
                    1e3 * dt_actor / (c.steps_per_chunk * c.num_envs)
                )
            self.recorder.store(rec)
            if opt_steps >= next_flush:
                self.recorder.flush(opt_steps)
                next_flush += c.flush_record_interval

            if self.evaluator is not None and opt_steps >= next_eval:
                score, eval_rec = self.evaluator.evaluate(
                    self.agent, learner_state, eval_index=len(eval_history)
                )
                eval_history.append((opt_steps, score))
                self.recorder.write_at(eval_rec, opt_steps)
                if score > best_score:
                    best_score = score
                    if self.recorder.model_dir is not None:
                        self.recorder.save_model("best", self.agent, learner_state)
                next_eval += c.eval_interval

        duration = time.perf_counter() - t0
        self.recorder.flush(opt_steps)
        return TrainResult(
            agent_state=learner_state,
            buffer_state=buffer_state,
            env_steps=env_steps,
            opt_steps=opt_steps,
            duration_sec=duration,
            samples_per_sec=env_steps / duration,
            opt_per_sec=opt_steps / duration,
            best_score=best_score,
            eval_history=eval_history,
        )
