"""Decompose the in-scan DQN update cost on the real chip.

The utilization audit (ARCHITECTURE.md "Utilization arithmetic") needs
WHERE the non-MXU time goes, measured the way the bench runs — bursts of
K iterations inside one `lax.scan` program, so per-dispatch tunnel latency
(~2.5 ms, see benchmarks/update_variants.py) cancels out.  Four scans at
the bench shape (batch 512, AtariCNN, 1024-env frame ring):

- fwd-only      — K CNN forwards (19.3 MF/sample)
- grad-only     — K loss fwd+bwd (≈57.9 MF/sample counted as 3 fwd-eq)
- update-fixed  — K full double-DQN updates on a FIXED batch (96.7 MF):
                  adds the stacked next-forward, Adam, polyak cond
- sample-only   — K replay samples from the frame ring (0 MF: pure
                  gather/stack — the replay tax on every update)

full-update-in-trainer (update-fixed + sample-only) should reconcile with
the bench's measured updates/s; each row prints achieved TFLOP/s against
the 197 TF/s bf16 peak of a v5e.
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
from border_tpu.replay import FrameReplayBuffer
from border_tpu.replay.buffer import TransitionBatch

A = 6
B = 512
K = 128          # scan length per timed program
FWD_MF = 19.33   # MFLOP/sample, one CNN forward
PEAK_TF = 197.0  # v5e bf16


def scan_time(fn, carry, iters=5):
    """Wall time per scan ITERATION of jit(lax.scan(fn)) with honest sync."""
    @jax.jit
    def prog(c):
        return jax.lax.scan(lambda c, _: (fn(c), None), c, None, length=K)[0]

    t_c = time.time()
    out = prog(carry)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    jax.block_until_ready(out)
    compile_s = time.time() - t_c
    t0 = time.perf_counter()
    for _ in range(iters):
        out = prog(out)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / (iters * K) * 1e3
    return ms, compile_s


def main():
    key = jax.random.PRNGKey(0)
    agent = DQN(DQNConfig(model=lambda n: AtariCNN(out_dim=n), lr=1e-4,
                          double_dqn=True, soft_update_interval=2_000,
                          tau=1.0, next_forward="stacked"))
    state = agent.init(key, spaces.Box(0, 255, (84, 84, 4), jnp.uint8),
                       spaces.Discrete(A))
    net = agent.net
    obs = jax.random.randint(key, (B, 84, 84, 4), 0, 255, jnp.uint8)
    batch = TransitionBatch(
        obs=obs, act=jnp.zeros((B,), jnp.int32),
        next_obs=jax.random.randint(jax.random.fold_in(key, 1),
                                    (B, 84, 84, 4), 0, 255, jnp.uint8),
        reward=jnp.zeros((B,)), terminated=jnp.zeros((B,), bool),
        truncated=jnp.zeros((B,), bool), weight=jnp.ones((B,)),
        ix_sample=jnp.zeros((B,), jnp.int32),
    )
    results = {}

    def report(name, ms, mf_per_sample, compile_s):
        # MFLOP·batch / ms → TFLOP/s:  1e6 FLOP · B / (1e-3 s) / 1e12 = /1e3
        tf = mf_per_sample * B / ms / 1e3 if ms > 0 else 0.0
        results[name] = {"ms": round(ms, 3), "tflops": round(tf, 1),
                         "pct_peak": round(tf / PEAK_TF * 100, 1),
                         "compile_s": round(compile_s, 1)}
        print(f"{name:<14s} {ms:7.3f} ms  {tf:6.1f} TF/s "
              f"({tf / PEAK_TF * 100:4.1f}% of bf16 peak)  "
              f"[compile {compile_s:.0f}s]", flush=True)

    # fwd-only: the INPUT must depend on the carry or XLA hoists the whole
    # forward out of the scan as loop-invariant (the r4 first run measured
    # 0.075 ms/iter — one forward amortized over 128 iterations).  A
    # scalar uint8 added to the obs defeats hoisting for one cheap
    # elementwise pass.
    p = state.params

    def fstep(carry):
        acc, c = carry
        out = net.apply(p, obs + c).sum()
        return (acc + out, c + jnp.uint8(1))

    ms, cs = scan_time(fstep, (jnp.float32(0), jnp.uint8(0)))
    report("fwd_only", ms, FWD_MF, cs)

    # grad-only
    def gstep(params):
        def loss(q_params):
            q = net.apply(q_params, obs)
            return jnp.mean(jnp.take_along_axis(q, batch.act[:, None], -1))
        g = jax.grad(loss)(params)
        return jax.tree.map(lambda a, b: a + 1e-9 * b, params, g)

    ms, cs = scan_time(gstep, p)
    report("grad_only", ms, 3 * FWD_MF, cs)

    # full update on a fixed batch (no replay sampling)
    ms, cs = scan_time(lambda s: agent.update(s, batch, key)[0], state)
    report("update_fixed", ms, 5 * FWD_MF, cs)

    # sample rows at bench scale for BOTH gather strategies.  The ring
    # state is threaded through the scan carry (loop-invariant ARGUMENT):
    # closing over it embeds the 1.8 GB ring as a program constant, which
    # the first r4 audit showed compiles gathers onto a pathological path
    # (~4 ms standalone vs ~0.4 ms in the real trainer scan).
    for mode in ("separate", "union"):
        buf = FrameReplayBuffer(capacity=256, num_envs=1024,
                                sample_mode=mode)
        buf_state = buf.init().replace(total=jnp.int32(2 * 256))

        def sstep(carry):
            acc, bs, k = carry
            k, k2 = jax.random.split(k)
            b = buf.sample(bs, k2, B)
            return (acc + b.obs.astype(jnp.float32).sum(), bs, k)

        ms, cs = scan_time(sstep, (jnp.float32(0), buf_state, key))
        report(f"sample_only[{mode}]", ms, 0.0, cs)

        # sample+update in one scan iteration — the update scan's real
        # shape minus env stepping; (update_sampled − update_fixed) is the
        # in-situ replay tax per update
        def sustep(carry):
            s, bs, k = carry
            k, k2, k3 = jax.random.split(k, 3)
            b = buf.sample(bs, k2, B)
            s2, _, _ = agent.update(s, b, k3)
            return (s2, bs, k)

        ms, cs = scan_time(sustep, (state, buf_state, key))
        report(f"update_sampled[{mode}]", ms, 5 * FWD_MF, cs)
        del buf_state
        import gc as _gc

        _gc.collect()

    return results


if __name__ == "__main__":
    import json

    print(json.dumps({"metric": "update_decomposition", "results": main()}))
