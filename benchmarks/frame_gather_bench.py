"""Find the regime where the Pallas frame-gather kernel beats XLA's gather.

VERDICT r2 weak #8 / r3 next #6: the `use_pallas` guidance in
FrameReplayBuffer must rest on a committed crossover measurement.  Both
paths are timed INSIDE a `lax.scan` burst (single dispatches through the
axon tunnel carry ~2.5 ms of latency, which swamped the first r4 sweep —
every cell read ~2.7 ms regardless of path), with the frame pool threaded
through the carry as a loop-invariant argument (a closure constant
compiles gathers onto a pathological path — see update_decomposition.py).

Frame-count scales down with frame size so the pool stays ~1.8 GB.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

K = 64  # scan length per timed program


def main(sizes=((56, 128), (112, 256), (224, 256), (448, 256)),
         pool_bytes=1 << 31, batch=512, stack=4, iters=5):
    import jax
    import jax.numpy as jnp

    from border_tpu.ops import gather_frames

    results = {}
    key = jax.random.PRNGKey(0)
    for rows, cols in sizes:
        n_frames = min(32_768, pool_bytes // (rows * cols))
        frames = jax.random.randint(
            key, (n_frames, rows, cols), 0, 255, jnp.uint8
        )

        def scan_time(gather):
            @jax.jit
            def prog(carry):
                def body(c, _):
                    acc, f, k = c
                    k, k2 = jax.random.split(k)
                    idx = jax.random.randint(
                        k2, (batch, stack), 0, n_frames, jnp.int32
                    )
                    g = gather(f, idx)
                    return (acc + g.astype(jnp.float32).sum(), f, k), None

                return jax.lax.scan(body, carry, None, length=K)[0]

            t_c = time.time()
            out = prog((jnp.float32(0), frames, key))
            jax.device_get(out[0])
            jax.block_until_ready(out)
            compile_s = time.time() - t_c
            t0 = time.perf_counter()
            for _ in range(iters):
                out = prog(out)
            jax.device_get(out[0])
            jax.block_until_ready(out)
            return (time.perf_counter() - t0) / (iters * K) * 1e3, compile_s

        ms_x, cx = scan_time(lambda f, i: f[i])
        ms_p, cp = scan_time(gather_frames)
        kb = rows * cols / 1024
        gbps = batch * stack * rows * cols / (ms_p / 1e3) / 1e9
        gbps_x = batch * stack * rows * cols / (ms_x / 1e3) / 1e9
        results[f"{rows}x{cols}"] = {
            "frame_kb": round(kb, 1), "n_frames": int(n_frames),
            "xla_ms": round(ms_x, 3), "pallas_ms": round(ms_p, 3),
            "pallas_speedup": round(ms_x / ms_p, 2),
            "xla_gbps": round(gbps_x, 1), "pallas_gbps": round(gbps, 1),
            "compile_s": [round(cx, 1), round(cp, 1)],
        }
        print(f"frame {rows}x{cols} ({kb:6.1f} KB, pool {n_frames}): "
              f"XLA {ms_x:7.3f} ms ({gbps_x:6.1f} GB/s)  "
              f"Pallas {ms_p:7.3f} ms ({gbps:6.1f} GB/s)  "
              f"speedup {ms_x/ms_p:5.2f}x", flush=True)
        del frames
        import gc

        gc.collect()
    return results


if __name__ == "__main__":
    import json

    print(json.dumps({"metric": "frame_gather_sweep", "results": main()}))
