"""Benchmark: fused actor-learner throughput on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json north star): **env-steps/s of DQN-Pong
training** — vectorized on-device Pong stepping + frame-dedup replay push +
batched CNN updates at an 8-samples-per-transition replay ratio, all in one
jitted program.  This is the reference's own throughput metric
(samples_per_sec, border-async-trainer/src/async_trainer/stat.rs:1-27);
multiply by 4 for ALE-frame-equivalents (frame-skip 4, env.rs:126-152).

Baseline: the reference publishes no numbers (BASELINE.md), so the baseline
is *self-measured on the same machine*: a faithful re-creation of Border's
per-step actor architecture for Pong (one env instance, batch-1 eager CNN
forward per step, one batch-32 update per step with a host readback per
step — the sync trainer.rs:267-327 shape with the dqn_atari config scale).
``vs_baseline`` = fused/per-step env-steps/s.

Timing methodology: every timed window ends with a device_get of a leaf of
every output PLUS block_until_ready, because on the tunneled `axon`
platform dispatch is deeply asynchronous and block_until_ready alone was
measured returning before compute finished (apparent 47M env-steps/s ≈ 3.8
PFLOP/s — physically impossible on one v5e).  With honest syncs the fused Pong
config runs ~1,049 batch-512 CNN updates/s after the round-4 optimization
ladder (union frame gather + kernel-folded /255): the update compute
alone measures 38.7 % of bf16 peak and the replay-sample tax is additive
— the per-piece audit is artifacts/update_decomposition.json and the
ladder artifacts/update_variants_r4_opts2.json (ARCHITECTURE.md
"Round-4 performance work").
"""

from __future__ import annotations

import json
import os
import sys
import time


def gate() -> int:
    """Learning gate: assert the committed learning-curve artifacts meet
    their targets (BASELINE.md north star: DQN-Pong eval return ≥ 18; plus
    CartPole/Pendulum/Seaquest parity bands).

    ONE rule, no fallback, no exemptions (VERDICT r3 next #2): every
    config needs ≥ 3 committed per-seed curves
    (artifacts/{name}_curve.json = seed 0, {name}_curve_seed{s}.json), and
    EVERY seed must pass on the median of 5 FRESH seeded evaluations of
    the run's BEST checkpoint (``final_evals`` in the artifact, produced
    by benchmarks/learning.py after training) — the checkpoint is the
    run's deliverable (≙ the reference's best-model selection,
    trainer.rs:251-255), and re-scoring it on fresh episodes removes
    single-lucky-eval passes.  An artifact without ``final_evals`` FAILS.
    Exits non-zero on any miss so the driver/judge can verify learning
    without trusting prose.  jax-free: safe to run while a training job
    owns the chip."""
    import glob as _glob
    import statistics

    art = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")
    results = {}
    ok = True
    for name in ("cartpole", "pendulum", "pong", "seaquest",
                 "breakout", "freeway", "spaceinvaders", "pong_host",
                 "pendulum_host", "breakout_host", "pong_per", "pong_slice",
                 "bc_offline", "awac_offline", "iql_offline"):
        paths = sorted(
            [p for p in (os.path.join(art, f"{name}_curve.json"),)
             if os.path.exists(p)]
            + _glob.glob(os.path.join(art, f"{name}_curve_seed*.json"))
        )
        if len(paths) < 3:
            results[name] = {"status": "MISSING_SEEDS", "seeds": len(paths),
                             "seeds_required": 3}
            ok = False
            continue
        seeds = {}
        target = None
        passed = True
        for p in paths:
            with open(p) as f:
                d = json.load(f)
            target = d.get("target")
            finals = d.get("final_evals")
            if not finals:
                seeds[str(d.get("seed", "?"))] = {
                    "status": "NO_FINAL_EVALS", "pass": False,
                }
                passed = False
                continue
            final_med = statistics.median(finals)
            seed_pass = target is None or final_med >= target
            best = max((pt["best"] for pt in d["curve"]), default=None)
            seeds[str(d.get("seed", "?"))] = {
                "final_median": round(float(final_med), 2),
                "best": None if best is None else round(float(best), 2),
                "pass": seed_pass,
            }
            passed = passed and seed_pass
        results[name] = {
            "status": "pass" if passed else "FAIL",
            "target": target,
            "rule": "median(5 fresh best-checkpoint evals) >= target, every seed",
            "seeds": seeds,
        }
        ok = ok and passed
    print(json.dumps({"metric": "learning_gate", "value": int(ok),
                      "unit": "pass", "vs_baseline": int(ok),
                      "results": results}))
    return 0 if ok else 1


if __name__ == "__main__" and "--gate" in sys.argv:
    raise SystemExit(gate())

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

from border_tpu.agents import DQN, DQNConfig
from border_tpu.core.env import VecEnv
from border_tpu.envs import make
from border_tpu.models import AtariCNN
from border_tpu.replay import FrameReplayBuffer, ReplayBuffer, Transition
from border_tpu.train import Trainer, TrainerConfig


def _sync(*trees) -> None:
    """Honest end-of-window sync: fetch one leaf of every tree to host and
    block on the rest (see module docstring)."""
    for t in trees:
        leaves = jax.tree.leaves(t)
        if leaves:
            jax.device_get(leaves[0].ravel()[0] if hasattr(leaves[0], "ravel")
                           else leaves[0])
    jax.block_until_ready(trees)


def _time_chunks(tr, cfg, n_chunks: int, do_update: bool = True):
    key = jax.random.PRNGKey(0)
    agent_state, vec_state, buf_state = tr.init_states(key, key)
    out = tr._chunk(agent_state, vec_state, buf_state, key, do_update)
    _sync(out)
    agent_state, vec_state, buf_state = out[0], out[1], out[2]
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        key, k = jax.random.split(key)
        out = tr._chunk(agent_state, vec_state, buf_state, k, do_update)
        agent_state, vec_state, buf_state = out[0], out[1], out[2]
    _sync(agent_state, vec_state, buf_state)
    dt = time.perf_counter() - t0
    env_steps_s = n_chunks * cfg.steps_per_chunk * cfg.num_envs / dt
    updates_s = n_chunks * tr.updates_per_chunk / dt if do_update else 0.0
    return env_steps_s, updates_s


def bench_pong_fused(n_chunks: int = 20):
    """Fused DQN-Pong: env-steps/s and updates/s on one chip, plus the
    env-engine-only rate (updates disabled)."""
    env = make("Pong-v0")
    agent = DQN(DQNConfig(model=lambda n: AtariCNN(out_dim=n), lr=1e-4,
                          double_dqn=True, soft_update_interval=2_000, tau=1.0))
    cfg = TrainerConfig(
        num_envs=1024, steps_per_chunk=32, batch_size=512,
        opt_interval=64,  # 8 gradient samples per transition (DQN-paper ratio)
        warmup_period=0, max_opts=10**9,
    )
    buf = FrameReplayBuffer(capacity=256, num_envs=1024)
    tr = Trainer(env, agent, buf, cfg)
    train_eps, train_ups = _time_chunks(tr, cfg, n_chunks, do_update=True)
    env_only_eps, _ = _time_chunks(tr, cfg, n_chunks, do_update=False)
    return train_eps, train_ups, env_only_eps


def bench_pong_reference_architecture(n_steps: int = 100) -> float:
    """Border's per-step shape on Pong: 1 env, eager batch-1 CNN act,
    one batch-32 update per step, host readback per step (the reference's
    loop reads every Step on the host, trainer/sampler.rs:99-144)."""
    env = make("Pong-v0")
    agent = DQN(DQNConfig(model=lambda n: AtariCNN(out_dim=n), lr=1e-4))
    vec = VecEnv(env, 1)
    buffer = FrameReplayBuffer(capacity=4_096, num_envs=1)
    key = jax.random.PRNGKey(0)
    agent_state = agent.init(key, vec.observation_space, vec.action_space)
    buf_state = buffer.init()
    vec_state = vec.reset(key)

    select = jax.jit(agent.select_action)
    proc = jax.jit(buffer.process_step)
    sample = jax.jit(lambda s, k: buffer.sample(s, k, 32))
    update = jax.jit(lambda s, b, k: agent.update(s, b, k))

    for i in range(40):  # fill + compile
        key, k = jax.random.split(key)
        action = select(agent_state, vec_state.obs, k)
        prev_obs, prev_len = vec_state.obs, vec_state.episode_length
        ts, vec_state = vec.step(vec_state, action)
        buf_state = proc(buf_state, prev_obs, action, ts, prev_len)
        jax.device_get(ts.reward)
    key, k = jax.random.split(key)
    agent_state, _, _ = update(agent_state, sample(buf_state, k), k)
    _sync(agent_state)

    t0 = time.perf_counter()
    for i in range(n_steps):
        key, k1, k2 = jax.random.split(key, 3)
        action = select(agent_state, vec_state.obs, k1)
        prev_obs, prev_len = vec_state.obs, vec_state.episode_length
        ts, vec_state = vec.step(vec_state, action)
        buf_state = proc(buf_state, prev_obs, action, ts, prev_len)
        agent_state, _, _ = update(agent_state, sample(buf_state, k2), k2)
        jax.device_get(ts.reward)  # per-step host sync, as in the reference
    _sync(agent_state, buf_state)
    return n_steps / (time.perf_counter() - t0)


def bench_fused(n_chunks: int = 10) -> float:
    """Fused vectorized CartPole trainer: env-steps/s over steady-state
    chunks (throughput config: 4096 envs, 1 update per 256 transitions)."""
    env = make("CartPole-v1")
    agent = DQN(DQNConfig(double_dqn=True))
    buffer = ReplayBuffer(capacity=65536)
    cfg = TrainerConfig(
        num_envs=4096,
        steps_per_chunk=64,
        batch_size=512,
        opt_interval=256,
        warmup_period=0,
        max_opts=10**9,
    )
    tr = Trainer(env, agent, buffer, cfg)
    eps, _ = _time_chunks(tr, cfg, n_chunks, do_update=True)
    return eps


def bench_reference_architecture(n_steps: int = 200) -> float:
    """Border's per-step synchronous loop, re-created: 1 env, eager batch-1
    forward per action, one batch-64 update per env step (opt_interval=1,
    ≙ examples/gym/dqn_cartpole config), host readback per step."""
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
    update = jax.jit(lambda s, b, k: agent.update(s, b, k))

    def step_once(key, agent_state, vec_state, buf_state, do_update):
        key, k1, k2 = jax.random.split(key, 3)
        action = select(agent_state, vec_state.obs, k1)
        prev_obs = vec_state.obs
        ts, vec_state = vec.step(vec_state, action)
        buf_state = push(buf_state, Transition(
            obs=prev_obs, act=action, next_obs=ts.final_obs, reward=ts.reward,
            terminated=ts.terminated, truncated=ts.truncated,
        ))
        if do_update:
            agent_state, _, _ = update(agent_state, sample(buf_state, k2), k2)
        jax.device_get(ts.reward)  # per-step host sync, as in the reference
        return key, agent_state, vec_state, buf_state

    for i in range(70):  # warmup fill + compile
        key, agent_state, vec_state, buf_state = step_once(
            key, agent_state, vec_state, buf_state, i >= 65
        )
    _sync(agent_state)

    t0 = time.perf_counter()
    for i in range(n_steps):
        key, agent_state, vec_state, buf_state = step_once(
            key, agent_state, vec_state, buf_state, True
        )
    _sync(agent_state, buf_state)
    return n_steps / (time.perf_counter() - t0)


def main():
    import gc

    pong_eps, pong_ups, pong_env_only = bench_pong_fused()
    gc.collect()  # drop the ~2 GB pong frame ring before the next bench
    pong_base = bench_pong_reference_architecture()
    gc.collect()
    cp_fused = bench_fused(n_chunks=10)
    gc.collect()
    cp_base = bench_reference_architecture(n_steps=200)
    # vs_baseline is an ARCHITECTURE-SHAPE ratio: fused program vs the
    # reference's per-step loop shape re-created in JAX on the same chip —
    # NOT a measurement of real Border (Rust + libtorch + C++ ALE), which
    # has no published numbers (BASELINE.md).  vs_border_estimate is the
    # conservative comparison: fused env-steps/s over a generous first-
    # principles estimate band for real Border's async Atari throughput
    # (1k–6k samples/s: per-step ALE ~0.1–0.2 ms + batch-1 CNN forward
    # ~0.3–2 ms per actor, ×8 actors; see BASELINE.md "Estimate band").
    BORDER_EST_HIGH = 6_000.0
    print(
        json.dumps(
            {
                "metric": "dqn_pong_env_steps_per_sec",
                "value": round(pong_eps, 1),
                "unit": "env-steps/s/chip",
                "vs_baseline": round(pong_eps / pong_base, 2),
                "baseline_def": "architecture-shape ratio: fused vs the reference's per-step loop shape (1 env, batch-1 CNN act, 1 update/step, host sync/step) re-created on the same chip — not real Border",
                "vs_border_estimate": round(pong_eps / BORDER_EST_HIGH, 1),
                "border_estimate_band_env_steps_per_sec": [1_000, 6_000],
                "pong_updates_per_sec": round(pong_ups, 1),
                "pong_ale_frames_per_sec": round(4 * pong_eps, 1),
                "pong_env_only_steps_per_sec": round(pong_env_only, 1),
                "baseline_env_steps_per_sec": round(pong_base, 1),
                "cartpole_env_steps_per_sec": round(cp_fused, 1),
                "cartpole_vs_baseline": round(cp_fused / cp_base, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
