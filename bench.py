"""Benchmark: fused actor-learner throughput on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: **env-steps/s** of DQN-CartPole training (env stepping +
replay push + sampled batched updates, all in one jitted program), the
reference's own throughput metric (samples_per_sec,
border-async-trainer/src/async_trainer/stat.rs:1-27).

Baseline: the reference publishes no numbers (BASELINE.md), so the baseline
is *self-measured on the same machine*: a faithful re-creation of Border's
synchronous per-step architecture (one env instance, batch-1 eager forward
per step, one batch-64 update per env step — trainer.rs:267-327 with the
dqn_cartpole config, examples/gym/dqn_cartpole/src/main.rs:38-53) driven
from the host.  ``vs_baseline`` = fused/sequential env-steps/s.
"""

from __future__ import annotations

import json
import os
import time

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

from border_tpu.agents import DQN, DQNConfig
from border_tpu.core.env import VecEnv
from border_tpu.envs import make
from border_tpu.replay import ReplayBuffer, Transition
from border_tpu.train import Trainer, TrainerConfig


def bench_fused(n_chunks: int = 10) -> float:
    """Fused vectorized trainer: env-steps/s over steady-state chunks."""
    env = make("CartPole-v1")
    agent = DQN(DQNConfig(double_dqn=True))
    buffer = ReplayBuffer(capacity=65536)
    # throughput config: 4096 envs, 1 update per 256 transitions
    cfg = TrainerConfig(
        num_envs=4096,
        steps_per_chunk=64,
        batch_size=512,
        opt_interval=256,
        warmup_period=0,
        max_opts=10**9,
    )
    tr = Trainer(env, agent, buffer, cfg)
    key = jax.random.PRNGKey(0)
    agent_state, vec_state, buf_state = tr.init_states(key, key)

    # warm-up compile + one chunk
    out = tr._chunk(agent_state, vec_state, buf_state, key, True)
    jax.block_until_ready(out[0])
    agent_state, vec_state, buf_state = out[0], out[1], out[2]

    t0 = time.perf_counter()
    for i in range(n_chunks):
        key, k = jax.random.split(key)
        out = tr._chunk(agent_state, vec_state, buf_state, k, True)
        agent_state, vec_state, buf_state = out[0], out[1], out[2]
    jax.block_until_ready(agent_state)
    dt = time.perf_counter() - t0
    return n_chunks * cfg.steps_per_chunk * cfg.num_envs / dt


def bench_reference_architecture(n_steps: int = 300) -> float:
    """Border's per-step synchronous loop, re-created: 1 env, eager batch-1
    forward per action, one batch-64 update per env step (opt_interval=1,
    ≙ examples/gym/dqn_cartpole config)."""
    env = make("CartPole-v1")
    agent = DQN(DQNConfig(double_dqn=True))
    buffer = ReplayBuffer(capacity=10_000)
    vec = VecEnv(env, 1)
    key = jax.random.PRNGKey(0)
    agent_state = agent.init(key, vec.observation_space, vec.action_space)
    obs0 = vec.observation_space.zero()
    act0 = vec.action_space.zero()
    example = Transition(
        obs=obs0, act=act0, next_obs=obs0,
        reward=jnp.float32(0.0), terminated=jnp.bool_(False), truncated=jnp.bool_(False),
    )
    buf_state = buffer.init(example)
    vec_state = vec.reset(key)

    select = jax.jit(agent.select_action)
    push = jax.jit(buffer.push)
    sample = jax.jit(lambda s, k: buffer.sample(s, k, 64))
    update = jax.jit(agent.update)

    # warmup fill + compile
    for i in range(70):
        key, k = jax.random.split(key)
        action = select(agent_state, vec_state.obs, k)
        prev_obs = vec_state.obs
        ts, vec_state = vec.step(vec_state, action)
        buf_state = push(buf_state, Transition(
            obs=prev_obs, act=action, next_obs=ts.final_obs, reward=ts.reward,
            terminated=ts.terminated, truncated=ts.truncated,
        ))
    key, k = jax.random.split(key)
    agent_state, _, _ = update(agent_state, sample(buf_state, k))
    jax.block_until_ready(agent_state)

    t0 = time.perf_counter()
    for i in range(n_steps):
        key, k1, k2 = jax.random.split(key, 3)
        action = select(agent_state, vec_state.obs, k1)
        prev_obs = vec_state.obs
        ts, vec_state = vec.step(vec_state, action)
        buf_state = push(buf_state, Transition(
            obs=prev_obs, act=action, next_obs=ts.final_obs, reward=ts.reward,
            terminated=ts.terminated, truncated=ts.truncated,
        ))
        agent_state, _, _ = update(agent_state, sample(buf_state, k2))
    jax.block_until_ready(agent_state)
    return n_steps / (time.perf_counter() - t0)


def main():
    fused = bench_fused()
    baseline = bench_reference_architecture()
    print(
        json.dumps(
            {
                "metric": "dqn_cartpole_env_steps_per_sec",
                "value": round(fused, 1),
                "unit": "env-steps/s/chip",
                "vs_baseline": round(fused / baseline, 2),
                "baseline_env_steps_per_sec": round(baseline, 1),
                "baseline_def": "Border-style per-step sync loop (1 env, batch-1 act, 1 update/step) on same chip",
            }
        )
    )


if __name__ == "__main__":
    main()
