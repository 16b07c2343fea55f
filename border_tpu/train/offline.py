"""Offline training: optimize from a fixed replay buffer (no env).

≙ Trainer::train_offline (border-core/src/trainer.rs:330-384): same cadence
machinery as the online loop but with opt_interval forced to 1 and no
sampling — every iteration is a gradient step on a batch drawn from the
pre-filled buffer.  Batches of M updates fuse into one jitted lax.scan.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp

from border_tpu.core.agent import Agent
from border_tpu.record.record import Record
from border_tpu.record.recorder import NullRecorder, Recorder
from border_tpu.replay.buffer import ReplayBuffer
from border_tpu.train.config import TrainerConfig
from border_tpu.train.evaluator import Evaluator
from border_tpu.train.trainer import TrainResult


class OfflineTrainer:
    def __init__(
        self,
        agent: Agent,
        buffer: ReplayBuffer,
        config: TrainerConfig = TrainerConfig(),
        recorder: Optional[Recorder] = None,
        evaluator: Optional[Evaluator] = None,
        updates_per_chunk: int = 100,
        eval_callback=None,
    ):
        self.agent = agent
        self.buffer = buffer
        self.config = config
        self.recorder = recorder or NullRecorder()
        self.evaluator = evaluator
        self.updates_per_chunk = updates_per_chunk
        # called after every evaluation with (opt_steps, env_steps=0,
        # score, best_score) — same contract as Trainer.eval_callback
        self.eval_callback = eval_callback

    @partial(jax.jit, static_argnums=(0,))
    def _chunk(self, agent_state, buf_state, key):
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

        keys = jax.random.split(key, self.updates_per_chunk)
        (agent_state, buf_state), metrics = jax.lax.scan(
            body, (agent_state, buf_state), keys
        )
        return agent_state, buf_state, jax.tree.map(jnp.mean, metrics)

    def train(
        self,
        agent_state: Any,
        buffer_state: Any,
        key: Optional[jax.Array] = None,
    ) -> TrainResult:
        c = self.config
        key = key if key is not None else jax.random.PRNGKey(c.seed)
        opt_steps = 0
        best_score = -float("inf")
        eval_history: List[Tuple[int, float]] = []
        next_eval = c.eval_interval
        next_flush = c.flush_record_interval
        t0 = time.perf_counter()

        while opt_steps < c.max_opts:
            key, k_chunk = jax.random.split(key)
            t_chunk = time.perf_counter()
            agent_state, buffer_state, metrics = self._chunk(
                agent_state, buffer_state, k_chunk
            )
            jax.block_until_ready(agent_state)
            dt = time.perf_counter() - t_chunk
            opt_steps = int(agent_state.n_opts)

            rec = Record({k: float(v) for k, v in metrics.items()})
            rec["opt_steps_per_sec"] = self.updates_per_chunk / dt
            self.recorder.store(rec)
            if opt_steps >= next_flush:
                self.recorder.flush(opt_steps)
                next_flush += c.flush_record_interval

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
                    self.eval_callback(opt_steps, 0, score, best_score)
                next_eval += c.eval_interval

        duration = time.perf_counter() - t0
        self.recorder.flush(opt_steps)
        return TrainResult(
            agent_state=agent_state,
            buffer_state=buffer_state,
            env_steps=0,
            opt_steps=opt_steps,
            duration_sec=duration,
            samples_per_sec=0.0,
            opt_per_sec=opt_steps / duration,
            best_score=best_score,
            eval_history=eval_history,
        )
