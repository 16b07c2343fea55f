"""Measure DQN-update structural variants on the real chip.

VERDICT r2 next #1: raise fused-learner throughput.  The double-DQN update
is 5 forward-equivalents (loss fwd, backward ≈2, online fwd on next_obs,
target fwd — ARCHITECTURE.md "Utilization arithmetic").  Variants:

- ``current``   — as shipped (`agents/dqn.py:update`): 4 separate CNN
  program invocations per update.
- ``stacked``   — the two next_obs forwards (online-argmax + target) run as
  ONE vmapped apply over stacked {params, target_params}: same FLOPs,
  half the kernel dispatches on the next_obs path, and XLA sees a single
  [2] batched conv stack it can tile wider.
- ``b1024``     — both at double batch: the bench metric is batch-512-
  EQUIVALENT updates/s (= samples/s ÷ 512), and bigger GEMMs fill the MXU
  further.

Run on the TPU; prints ms/update and b512-equivalent updates/s per variant.
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

import jax.numpy as jnp

from border_tpu.agents import DQN, DQNConfig
from border_tpu.core import spaces
from border_tpu.models import AtariCNN
from border_tpu.replay.buffer import TransitionBatch

A = 6


def timeit(fn, state, batch, key, iters=30, warmup=3):
    s = state
    for _ in range(warmup):
        s = fn(s, batch, key)
    jax.device_get(jax.tree.leaves(s.params)[0].ravel()[0])
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(s, batch, key)
    jax.device_get(jax.tree.leaves(s.params)[0].ravel()[0])
    jax.block_until_ready(s)
    return (time.perf_counter() - t0) / iters * 1e3


def make_batch(key, B):
    k1, k2, k3 = jax.random.split(key, 3)
    return TransitionBatch(
        obs=jax.random.randint(k1, (B, 84, 84, 4), 0, 255, jnp.uint8),
        act=jax.random.randint(k3, (B,), 0, A, jnp.int32),
        next_obs=jax.random.randint(k2, (B, 84, 84, 4), 0, 255, jnp.uint8),
        reward=jnp.zeros((B,)),
        terminated=jnp.zeros((B,), bool),
        truncated=jnp.zeros((B,), bool),
        weight=jnp.ones((B,)),
        ix_sample=jnp.zeros((B,), jnp.int32),
    )


def main():
    key = jax.random.PRNGKey(0)
    results = {}
    for B in (512, 1024):
        batch = make_batch(key, B)
        for variant in ("separate", "stacked"):
            agent = DQN(DQNConfig(model=lambda n: AtariCNN(out_dim=n),
                                  lr=1e-4, double_dqn=True,
                                  soft_update_interval=2_000, tau=1.0,
                                  next_forward=variant))
            state = agent.init(key, spaces.Box(0, 255, (84, 84, 4), jnp.uint8),
                               spaces.Discrete(A))
            upd = jax.jit(lambda s, b, k, ag=agent: ag.update(s, b, k)[0],
                          donate_argnums=0)
            ms = timeit(upd, state, batch, key)
            eq512 = B / 512 * 1e3 / ms
            results[f"{variant}_b{B}"] = {
                "ms_per_update": round(ms, 3),
                "b512_equiv_updates_per_sec": round(eq512, 1),
            }
            print(f"{variant:<10s} b{B}: {ms:7.3f} ms/update  "
                  f"{eq512:7.1f} b512-eq updates/s", flush=True)
    return results


if __name__ == "__main__":
    import json

    print(json.dumps({"metric": "update_variants", "results": main()}))
