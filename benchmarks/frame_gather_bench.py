"""Find the regime where the Pallas frame-gather kernel beats XLA's gather.

VERDICT r2 weak #8: at 84×84 (7 KB) frames the kernel's per-frame DMAs are
latency-bound and XLA's bulk gather wins by ~7 % end-to-end; this sweep
measures both paths across frame sizes (84² → 336², i.e. 7 KB → 113 KB
per frame) so the `use_pallas` guidance in FrameReplayBuffer rests on a
committed crossover measurement instead of a single point.

Standalone-gather timing (not fused into a consumer): both paths pay the
materialization, so the comparison is apples-to-apples.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(sizes=((56, 128), (112, 256), (224, 256), (448, 256)),
         n_frames=32_768, batch=512, stack=4, iters=20):
    import jax
    import jax.numpy as jnp

    from border_tpu.ops import gather_frames

    results = {}
    key = jax.random.PRNGKey(0)
    for rows, cols in sizes:
        frames = jax.random.randint(
            key, (n_frames, rows, cols), 0, 255, jnp.uint8
        )
        idx = jax.random.randint(
            jax.random.fold_in(key, 1), (batch, stack), 0, n_frames,
            jnp.int32,
        )
        xla = jax.jit(lambda f, i: f[i])
        pls = jax.jit(lambda f, i: gather_frames(f, i))

        def timeit(fn):
            out = fn(frames, idx)
            jax.device_get(out.ravel()[0])
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(frames, idx)
            jax.device_get(out.ravel()[0])
            jax.block_until_ready(out)
            return (time.perf_counter() - t0) / iters * 1e3

        ms_x = timeit(xla)
        ms_p = timeit(pls)
        kb = rows * cols / 1024
        gbps = batch * stack * rows * cols / (ms_p / 1e3) / 1e9
        results[f"{rows}x{cols}"] = {
            "frame_kb": round(kb, 1), "xla_ms": round(ms_x, 3),
            "pallas_ms": round(ms_p, 3),
            "pallas_speedup": round(ms_x / ms_p, 2),
            "pallas_gbps": round(gbps, 1),
        }
        print(f"frame {rows}x{cols} ({kb:6.1f} KB): XLA {ms_x:7.3f} ms  "
              f"Pallas {ms_p:7.3f} ms  speedup {ms_x/ms_p:5.2f}x",
              flush=True)
    return results


if __name__ == "__main__":
    import json

    print(json.dumps({"metric": "frame_gather_sweep", "results": main()}))
