"""Host-native env → device learner training loop.

≙ the reference's entire Atari architecture: C++ envs stepped by host
threads (border-atari-env/src/atari_env/ale.rs:62-100 behind the actor
thread pool, border-async-trainer/src/actor/base.rs:120-178) feeding a
device learner.  Here the host side is :class:`NativeVecEnv` (C++
worker-thread envpool) behind :class:`AsyncEnvFeeder`, and the device side
is the same jitted act/push/sample/update programs the fused Trainer uses.

Pipelining (the channel analogue, SURVEY.md §2.1 "host-side C++ vectorized
ALE feeding the device via double-buffered transfers"): while the C++ pool
steps the envs with the actions of iteration *t*, the device runs iteration
*t*'s update burst — host env time hides behind device compute.  The loop
reports ``host_wait_frac`` (fraction of wall time blocked on the env
results) so the overlap is measurable, alongside the reference's throughput
records (samples_per_sec / opt_steps_per_sec,
border-async-trainer/src/async_trainer/stat.rs:1-27).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from border_tpu.core import spaces
from border_tpu.core.agent import Agent
from border_tpu.envs.native import AsyncEnvFeeder, NativeVecEnv
from border_tpu.record.record import Record
from border_tpu.record.recorder import NullRecorder, Recorder
from border_tpu.replay.buffer import ReplayBuffer, Transition
from border_tpu.train.config import TrainerConfig
from border_tpu.train.trainer import TrainResult


class HostEvaluator:
    """Deterministic-seed evaluation on fresh native envs
    (≙ DefaultEvaluator's reset_with_index discipline,
    border-core/src/evaluator/default_evaluator.rs:40-116)."""

    def __init__(self, env_name: str, n_episodes: int = 5,
                 max_steps: int = 1_000, base_seed: int = 424242):
        self.env_name = env_name
        self.n_episodes = n_episodes
        self.max_steps = max_steps
        self.base_seed = base_seed
        self._agent = None
        self._select = None

    def evaluate(self, agent: Agent, agent_state, eval_index: int = 0
                 ) -> Tuple[float, Record]:
        env = NativeVecEnv(self.env_name, self.n_episodes,
                           seed=self.base_seed + eval_index)
        # cache the jitted selector per agent: a fresh jax.jit wrapper per
        # evaluation would retrace every time
        if self._select is None or self._agent is not agent:
            self._agent = agent
            self._select = jax.jit(agent.select_action_eval)
        select = self._select
        key = jax.random.PRNGKey(self.base_seed + eval_index)
        obs = env.reset()
        returns = np.zeros(self.n_episodes, np.float64)
        running = np.ones(self.n_episodes, bool)
        for _ in range(self.max_steps):
            key, k = jax.random.split(key)
            act = np.asarray(select(agent_state, jnp.asarray(obs), k))
            obs, rew, term, trunc = env.step(act)
            returns += rew * running
            running &= ~(term | trunc)
            if not running.any():
                break
        env.close()
        score = float(returns.mean())
        return score, Record({"Episode return": score})


class HostEnvTrainer:
    """Trains a device agent on host-native (C++) envs with overlap.

    Per iteration (one lockstep vec step = ``num_envs`` transitions):

    1. device selects actions for the current obs (jitted),
    2. actions go to the C++ pool via the feeder (host threads step),
    3. device runs this iteration's update burst — OVERLAPPED with 2,
    4. results are collected and pushed into the device replay (jitted).

    Update:transition ratio matches the fused Trainer: ``num_envs /
    opt_interval · n_updates_per_opt`` updates per iteration (fractional
    ratios carried as debt, so long-run ratios are exact).
    """

    def __init__(
        self,
        env_name: str,
        agent: Agent,
        buffer: ReplayBuffer,
        config: TrainerConfig = TrainerConfig(),
        recorder: Optional[Recorder] = None,
        evaluator: Optional[HostEvaluator] = None,
        n_threads: Optional[int] = None,
    ):
        self.env_name = env_name
        self.agent = agent
        self.buffer = buffer
        self.config = config
        self.recorder = recorder or NullRecorder()
        self.evaluator = evaluator
        self.env = NativeVecEnv(env_name, config.num_envs, seed=config.seed,
                                n_threads=n_threads)
        self.observation_space = spaces.Box(
            -np.inf, np.inf, (self.env.obs_dim,), jnp.float32
        )
        self.action_space = spaces.Discrete(self.env.num_actions)
        c = config
        self.updates_per_transition = c.n_updates_per_opt / c.opt_interval
        from border_tpu.train.trainer import Trainer

        Trainer._check_nstep_stride(buffer, c.num_envs)

    # -- jitted device programs -------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def _select(self, agent_state, obs, key):
        return self.agent.select_action(agent_state, obs, key)

    @partial(jax.jit, static_argnums=0)
    def _ingest(self, agent_state, buf_state, obs, act, final_obs, rew,
                term, trunc):
        buf_state = self.buffer.push(buf_state, Transition(
            obs=obs, act=act, next_obs=final_obs, reward=rew,
            terminated=term, truncated=trunc,
        ))
        agent_state = self.agent.on_env_step(agent_state, self.config.num_envs)
        return agent_state, buf_state

    @partial(jax.jit, static_argnums=(0, 4))
    def _update_burst(self, agent_state, buf_state, key, m: int):
        def body(carry, k):
            agent_state, buf_state = carry
            k_s, k_u = jax.random.split(k)
            batch = self.buffer.sample(
                buf_state, k_s, self.config.batch_size,
                n_opts=agent_state.n_opts,
            )
            agent_state, metrics, td_err = self.agent.update(
                agent_state, batch, k_u
            )
            if td_err is not None:
                buf_state = self.buffer.update_priority(
                    buf_state, batch.ix_sample, td_err
                )
            return (agent_state, buf_state), metrics

        keys = jax.random.split(key, m)
        (agent_state, buf_state), metrics = jax.lax.scan(
            body, (agent_state, buf_state), keys
        )
        return agent_state, buf_state, jax.tree.map(jnp.mean, metrics)

    # -- orchestration ------------------------------------------------------
    def train(self, key: Optional[jax.Array] = None) -> TrainResult:
        c = self.config
        key = key if key is not None else jax.random.PRNGKey(c.seed)
        k_agent, k_loop = jax.random.split(key)

        agent_state = self.agent.init(
            k_agent, self.observation_space, self.action_space
        )
        obs0 = self.observation_space.zero()
        buf_state = self.buffer.init(Transition(
            obs=obs0, act=self.action_space.zero(), next_obs=obs0,
            reward=jnp.float32(0.0), terminated=jnp.bool_(False),
            truncated=jnp.bool_(False),
        ))

        feeder = AsyncEnvFeeder(self.env, step_fn=self.env.step_final)
        obs = self.env.reset()

        env_steps = 0
        opt_steps = 0
        best_score = -float("inf")
        eval_history: List[Tuple[int, float]] = []
        next_eval = c.eval_interval
        next_flush = c.flush_record_interval
        update_debt = 0.0
        wait_time = 0.0
        t0 = time.perf_counter()
        t_window = t0
        window_steps = 0

        # prime the pipeline: submit the first actions before looping
        k_loop, k0 = jax.random.split(k_loop)
        act = self._select(agent_state, jnp.asarray(obs), k0)
        feeder.submit(np.asarray(act))
        pending_obs, pending_act = obs, act

        try:
            while opt_steps < c.max_opts:
                k_loop, k_upd, k_act = jax.random.split(k_loop, 3)

                # device update burst — overlaps the host env step in flight
                warmed = int(self.buffer.fill(buf_state)) >= max(
                    c.warmup_period, c.batch_size
                )
                metrics: Dict[str, Any] = {}
                if warmed:
                    update_debt += c.num_envs * self.updates_per_transition
                    m = int(update_debt)
                    update_debt -= m
                    if m > 0:
                        agent_state, buf_state, metrics = self._update_burst(
                            agent_state, buf_state, k_upd, m
                        )
                        opt_steps = int(agent_state.n_opts)

                # collect the host step started last iteration
                t_w = time.perf_counter()
                obs2, final_obs, rew, term, trunc = feeder.collect()
                wait_time += time.perf_counter() - t_w

                # push transition (obs_t, act_t, final_obs_{t+1})
                agent_state, buf_state = self._ingest(
                    agent_state, buf_state,
                    jnp.asarray(pending_obs), pending_act,
                    jnp.asarray(final_obs), jnp.asarray(rew),
                    jnp.asarray(term), jnp.asarray(trunc),
                )
                env_steps += c.num_envs
                window_steps += c.num_envs

                # next actions → host
                act = self._select(agent_state, jnp.asarray(obs2), k_act)
                feeder.submit(np.asarray(act))
                pending_obs, pending_act = obs2, act

                # telemetry at chunk cadence
                if window_steps >= c.steps_per_chunk * c.num_envs:
                    now = time.perf_counter()
                    rec = Record({k: float(v) for k, v in metrics.items()})
                    rec["env_steps"] = float(env_steps)
                    rec["samples_per_sec"] = window_steps / (now - t_window)
                    rec["host_wait_frac"] = wait_time / (now - t_window)
                    self.recorder.store(rec)
                    t_window, window_steps, wait_time = now, 0, 0.0

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
                            self.recorder.save_model(
                                "best", self.agent, agent_state
                            )
                    next_eval += c.eval_interval
        finally:
            feeder.close()

        duration = time.perf_counter() - t0
        self.recorder.flush(opt_steps)
        return TrainResult(
            agent_state=agent_state,
            buffer_state=buf_state,
            env_steps=env_steps,
            opt_steps=opt_steps,
            duration_sec=duration,
            samples_per_sec=env_steps / duration,
            opt_per_sec=opt_steps / duration,
            best_score=best_score,
            eval_history=eval_history,
        )
