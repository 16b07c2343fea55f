"""In-scan DQN update-variant timing on the bench Pong config.

`benchmarks/update_variants.py` times single dispatches, which on the
tunneled axon platform are dominated by ~2.5 ms of per-call dispatch
latency.  The bench's real shape is a 512-update `lax.scan` burst inside
one program (`Trainer._update_scan`), so this measures THAT: update-only
chunks of the fused Pong trainer for {separate, stacked} × {batch 512
(opt_interval 64), batch 1024 (opt_interval 128)} — same 8-samples-per-
transition replay ratio in every cell, so `b512-equivalent updates/s`
(= sampled-frames/s ÷ 512) is comparable across batch sizes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from border_tpu.agents import DQN, DQNConfig
from border_tpu.envs import make
from border_tpu.models import AtariCNN
from border_tpu.replay import FrameReplayBuffer
from border_tpu.train import Trainer, TrainerConfig


def _sync(*trees):
    for t in trees:
        leaf = jax.tree.leaves(t)[0]
        jax.device_get(leaf.ravel()[0])
    jax.block_until_ready(trees)


def time_config(variant: str, batch_size: int, n_chunks: int = 8,
                sample_mode: str = "separate", prefetch: bool = False,
                scale_in_kernel: bool = False, use_pallas=None,
                unroll: int = 1):
    env = make("Pong-v0")
    agent = DQN(DQNConfig(
        model=lambda n: AtariCNN(out_dim=n, scale_in_kernel=scale_in_kernel),
        lr=1e-4, double_dqn=True, soft_update_interval=2_000,
        tau=1.0, next_forward=variant))
    cfg = TrainerConfig(
        num_envs=1024, steps_per_chunk=32, batch_size=batch_size,
        opt_interval=batch_size // 8,  # keep 8 samples per transition
        warmup_period=0, max_opts=10**9, prefetch_sample=prefetch,
        update_scan_unroll=unroll,
    )
    buf = FrameReplayBuffer(capacity=256, num_envs=1024,
                            sample_mode=sample_mode, use_pallas=use_pallas)
    tr = Trainer(env, agent, buf, cfg)
    key = jax.random.PRNGKey(0)
    agent_state, vec_state, buf_state = tr.init_states(key, key)
    t_c = time.time()
    out = tr._chunk(agent_state, vec_state, buf_state, key, True)
    _sync(out)
    compile_s = time.time() - t_c
    agent_state, vec_state, buf_state = out[0], out[1], out[2]
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        key, k = jax.random.split(key)
        out = tr._chunk(agent_state, vec_state, buf_state, k, True)
        agent_state, vec_state, buf_state = out[0], out[1], out[2]
    _sync(agent_state, vec_state, buf_state)
    dt = time.perf_counter() - t0
    env_steps_s = n_chunks * cfg.steps_per_chunk * cfg.num_envs / dt
    updates_s = n_chunks * tr.updates_per_chunk / dt
    eq512 = updates_s * batch_size / 512
    return {
        "env_steps_per_sec": round(env_steps_s, 1),
        "updates_per_sec": round(updates_s, 1),
        "b512_equiv_updates_per_sec": round(eq512, 1),
        "compile_s": round(compile_s, 1),
    }


def main():
    results = {}
    for variant in ("separate", "stacked"):
        for B in (512, 1024):
            r = time_config(variant, B)
            results[f"{variant}_b{B}"] = r
            print(f"{variant:<9s} b{B}: {r['env_steps_per_sec']:>9,.0f} env-steps/s  "
                  f"{r['updates_per_sec']:>7.1f} upd/s  "
                  f"{r['b512_equiv_updates_per_sec']:>7.1f} b512-eq/s  "
                  f"(compile {r['compile_s']:.0f}s)", flush=True)
    return results


if __name__ == "__main__":
    import json

    print(json.dumps({"metric": "update_variants_inscan", "results": main()}))
