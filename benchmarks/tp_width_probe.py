"""Where tensor parallelism pays: MXU occupancy vs channel width.

The GSPMD dp×tp trainer column-shards kernels over the ``model`` axis
(parallel/gspmd.py).  At the PARITY AtariCNN widths (conv1 = 32 output
channels) a tp=2 shard leaves 16 of 128 MXU output lanes — the lane-
occupancy model says the shards cannot make up the collectives, so tp>1
must LOSE there.  This probe measures the premise on one chip: the
achieved fraction of bf16 peak for the CNN's gradient step as channel
width scales.  If %-peak grows toward saturation with width, a tp shard
of a WIDE model retains full-lane efficiency (its local width still
≥128) and tp=2 halves wall-clock minus collectives — the regime the
beyond-reference GSPMD axis exists for.  (VERDICT r4 weak #3.)

Methodology as in the r4/r5 ladders: in-scan bursts, steady-state
discard window, honest device_get syncs.  Grad step ≈ 3 forward-
equivalents (loss fwd + bwd ≈ 2 fwd) — the same accounting as
artifacts/update_decomposition.json's grad_only row.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from border_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import flax.linen as nn

V5E_BF16_PEAK = 197e12


class WideCNN(nn.Module):
    """AtariCNN-shaped conv stack with a channel multiplier (local to the
    probe: the product model stays the parity AtariCNN)."""

    mult: int = 1

    @nn.compact
    def __call__(self, x):  # [B, 84, 84, 4] uint8
        m = self.mult
        x = x.astype(jnp.bfloat16) / 255.0
        x = nn.relu(nn.Conv(32 * m, (8, 8), strides=(4, 4), padding="VALID",
                            dtype=jnp.bfloat16)(x))
        x = nn.relu(nn.Conv(64 * m, (4, 4), strides=(2, 2), padding="VALID",
                            dtype=jnp.bfloat16)(x))
        x = nn.relu(nn.Conv(64 * m, (3, 3), strides=(1, 1), padding="VALID",
                            dtype=jnp.bfloat16)(x))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(512, dtype=jnp.bfloat16)(x))
        return nn.Dense(6, dtype=jnp.bfloat16)(x)


def fwd_flops(m: int) -> float:
    """Per-sample forward FLOPs (2·MACs), channel multiplier m."""
    conv1 = 20 * 20 * (8 * 8 * 4) * (32 * m) * 2
    conv2 = 9 * 9 * (4 * 4 * 32 * m) * (64 * m) * 2
    conv3 = 7 * 7 * (3 * 3 * 64 * m) * (64 * m) * 2
    fc1 = (7 * 7 * 64 * m) * 512 * 2
    fc2 = 512 * 6 * 2
    return float(conv1 + conv2 + conv3 + fc1 + fc2)


def measure(mult: int, batch: int = 512, iters: int = 128,
            n_bursts: int = 4):
    net = WideCNN(mult=mult)
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (batch, 84, 84, 4), 0, 255, jnp.uint8)
    params = net.init(key, x)

    def loss(p, x):
        return jnp.mean(net.apply(p, x).astype(jnp.float32) ** 2)

    grad = jax.grad(loss)

    @jax.jit
    def burst(params, x):
        def body(p, _):
            g = grad(p, x)
            return jax.tree.map(lambda a, b: a - 1e-6 * b, p, g), ()

        params, _ = jax.lax.scan(body, params, None, length=iters)
        return params

    t0 = time.time()
    p = burst(params, x)
    jax.device_get(jax.tree.leaves(p)[0].ravel()[0])
    compile_s = time.time() - t0
    p = burst(p, x)  # steady-state discard
    jax.device_get(jax.tree.leaves(p)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n_bursts):
        p = burst(p, x)
    jax.device_get(jax.tree.leaves(p)[0].ravel()[0])
    jax.block_until_ready(p)
    dt = time.perf_counter() - t0
    ms_per_step = 1e3 * dt / (n_bursts * iters)
    flops = 3.0 * fwd_flops(mult) * batch  # grad ≈ 3 fwd-equivalents
    tf = flops / (ms_per_step * 1e-3) / 1e12
    return {
        "channel_mult": mult,
        "conv1_out_channels": 32 * mult,
        "ms_per_grad_step_b512": round(ms_per_step, 3),
        "achieved_tflops": round(tf, 1),
        "pct_bf16_peak": round(100 * tf * 1e12 / V5E_BF16_PEAK, 1),
        "compile_s": round(compile_s, 1),
    }


def main():
    results = {}
    for m in (1, 4, 8):
        r = measure(m)
        results[f"mult{m}"] = r
        print(f"mult{m} (conv1={32*m} ch): {r['ms_per_grad_step_b512']} ms  "
              f"{r['achieved_tflops']} TF/s  {r['pct_bf16_peak']}% peak  "
              f"(compile {r['compile_s']}s)", flush=True)
    out = {"metric": "tp_width_probe", "batch": 512,
           "accounting": "grad step = 3 forward-equivalents",
           "results": results}
    with open(os.path.join(os.path.dirname(__file__), "..", "artifacts",
                           "tp_width_probe.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
