"""Round-5 update-path ladder: slice-mode sampling + the PER path.

Extends the r4 in-scan ladder (update_variants_inscan.py) with:

- ``sample_mode="slice"`` at group sizes {32, 64, 128}: the replay gather
  replaced by streaming ``dynamic_slice`` windows (frame_buffer.py) —
  attacks the ~0.33 ms/update additive sample tax the r4 decomposition
  measured (artifacts/update_decomposition.json), chasing the 1,540
  b512-updates/s compute bound (VERDICT r4 next #1).
- the PER update path (device sum tree over env×slot leaves, sequential
  scan with priority feedback) — the on-chip PER number the audits never
  measured (VERDICT r4 next #3).

Methodology (memory traps): every cell compiles, then runs a DISCARD
window of 4 chunks (the first post-compile window is contaminated),
then times an 8-chunk window ending in a device_get sync.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from border_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from border_tpu.agents import DQN, DQNConfig
from border_tpu.envs import make
from border_tpu.models import AtariCNN
from border_tpu.replay import FrameReplayBuffer, PerConfig
from border_tpu.train import Trainer, TrainerConfig


def _sync(*trees):
    for t in trees:
        leaf = jax.tree.leaves(t)[0]
        jax.device_get(leaf.ravel()[0])
    jax.block_until_ready(trees)


def time_config(tag: str, batch_size: int = 512, n_chunks: int = 8,
                sample_mode: str = "union", slice_group: int = 64,
                per: bool = False, update_only: bool = False,
                ups: int = 1, sort_samples: bool = False):
    env = make("Pong-v0")
    agent = DQN(DQNConfig(
        model=lambda n: AtariCNN(out_dim=n), lr=1e-4, double_dqn=True,
        soft_update_interval=2_000, tau=1.0))
    cfg = TrainerConfig(
        num_envs=1024, steps_per_chunk=32, batch_size=batch_size,
        opt_interval=batch_size // 8,  # 8 samples per transition
        warmup_period=0, max_opts=10**9,
        updates_per_sample_batch=ups,
    )
    buf = FrameReplayBuffer(
        capacity=256 if not per else 512,  # PER needs N·cap = 2^k
        num_envs=1024, sample_mode=sample_mode, slice_group=slice_group,
        per=PerConfig() if per else None, sort_samples=sort_samples,
    )
    tr = Trainer(env, agent, buf, cfg)
    key = jax.random.PRNGKey(0)
    agent_state, vec_state, buf_state = tr.init_states(key, key)
    # fill + compile: the FULL chunk populates the ring so update-only
    # cells never sample unwritten slots
    t_c = time.time()
    out = tr._chunk(agent_state, vec_state, buf_state, key, True)
    _sync(out)
    compile_s = time.time() - t_c
    agent_state, vec_state, buf_state = out[0], out[1], out[2]
    do_env = not update_only
    for _ in range(4):  # fill more + steady-state discard window
        key, k = jax.random.split(key)
        out = tr._chunk(agent_state, vec_state, buf_state, k, True, do_env)
        agent_state, vec_state, buf_state = out[0], out[1], out[2]
    _sync(agent_state, vec_state, buf_state)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        key, k = jax.random.split(key)
        out = tr._chunk(agent_state, vec_state, buf_state, k, True, do_env)
        agent_state, vec_state, buf_state = out[0], out[1], out[2]
    _sync(agent_state, vec_state, buf_state)
    dt = time.perf_counter() - t0
    updates_s = n_chunks * tr.updates_per_chunk / dt
    r = {
        "env_steps_per_sec": round(
            n_chunks * cfg.steps_per_chunk * cfg.num_envs / dt, 1),
        "updates_per_sec": round(updates_s, 1),
        "b512_equiv_updates_per_sec": round(updates_s * batch_size / 512, 1),
        "compile_s": round(compile_s, 1),
    }
    print(f"{tag:<28s}: {r['env_steps_per_sec']:>9,.0f} env-steps/s  "
          f"{r['b512_equiv_updates_per_sec']:>7.1f} b512-eq/s  "
          f"(compile {r['compile_s']:.0f}s)", flush=True)
    return r


def main():
    # v3 grid (final ladder).  v1 (per-position select clamp: 866, kept
    # in update_variants_r5_selects.json) and v2 (closed-form clamp:
    # 906, update_variants_r5_slice.json) both measured the slice route
    # LOSING to the fused XLA gather — the gather fuses into its conv
    # consumers, dynamic_slice+concat does not.  v3 attacks what the r4
    # trace actually measured: ~166 us/update while-loop self-time and
    # the per-dispatch gather/transpose chain — amortized by sampling
    # ONE k*B batch per scan iteration and applying k sequential B-sized
    # updates (identical SGD semantics), plus optional sorted draws
    # (monotone gather addresses; a batch is a set).
    results = {}
    results["union_b512"] = time_config("union_b512 (r4 default)")
    results["union_b512_sorted"] = time_config(
        "union_b512_sorted", sort_samples=True)
    for k in (2, 4, 8):
        results[f"union_b512_ups{k}"] = time_config(
            f"union_b512_ups{k}", ups=k)
    results["union_b512_ups4_sorted"] = time_config(
        "union_b512_ups4_sorted", ups=4, sort_samples=True)
    results["per_b512"] = time_config("per_b512 (sum-tree PER)", per=True)
    results["union_b512_updonly"] = time_config(
        "union_b512_updonly", update_only=True)
    results["union_b512_ups4_updonly"] = time_config(
        "union_b512_ups4_updonly", ups=4, update_only=True)
    results["per_b512_updonly"] = time_config(
        "per_b512_updonly", per=True, update_only=True)
    return results


if __name__ == "__main__":
    out = {"metric": "update_variants_r5", "results": main()}
    path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                       "update_variants_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
