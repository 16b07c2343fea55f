"""One-process on-chip performance audit (round 4).

Runs every deferred audit in a SINGLE TPU process (the tunneled chip
punishes rapid claim cycling) and writes each result incrementally to
``artifacts/`` so a partial run still commits evidence:

1. ``update_decomposition.json``  — per-piece in-scan timings (fwd /
   fwd+bwd / full update on fixed batch / replay sample) at the bench
   shape; the utilization-ceiling audit ARCHITECTURE.md cites.
2. ``update_variants_inscan_steady.json`` — steady-state re-measure of
   {separate,stacked} × {b512,b1024} full chunks, reconciling the r3
   artifact's post-compile-contaminated ``separate_b512`` row (562.4 with
   compile_s 877) against the "~850" figure in ARCHITECTURE.md's table.
3. ``profile_update.json``        — single-dispatch per-op timings +
   XLA ``cost_analysis`` (flops / bytes) for the update program.
4. ``frame_gather_sweep.json``    — Pallas-vs-XLA frame gather crossover
   (VERDICT r2 weak #8 / r3 next #6).
5. ``profile_trace/``             — a ``jax.profiler`` trace of an
   update-only burst + an xprof-derived op summary when the tunnel
   supports device tracing (best-effort; failures recorded, not fatal).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

ART = os.path.join(os.path.dirname(__file__), "..", "artifacts")


def save(name: str, payload) -> None:
    path = os.path.join(ART, name)
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"[audit] wrote {path}", flush=True)


def phase(label: str, fn):
    print(f"[audit] === {label} ===", flush=True)
    t0 = time.time()
    try:
        out = fn()
        print(f"[audit] {label} done in {time.time() - t0:.0f}s", flush=True)
        return out
    except Exception:
        traceback.print_exc()
        print(f"[audit] {label} FAILED after {time.time() - t0:.0f}s",
              flush=True)
        return None
    finally:
        gc.collect()


def steady_inscan():
    """Steady-state variant timings: same programs as
    benchmarks/update_variants_inscan.py but with a discarded first timed
    window and a longer second window, so no row is contaminated by
    post-compile warmup (the r3 separate_b512 row was measured right
    after a 15-minute remote compile)."""
    import update_variants_inscan as uv

    results = {}
    cells = [("separate", 512, "separate"), ("stacked", 512, "separate"),
             ("stacked", 1024, "separate"), ("stacked", 512, "union")]
    for variant, B, mode in cells:
        r_warm = uv.time_config(variant, B, n_chunks=4, sample_mode=mode)
        r = uv.time_config(variant, B, n_chunks=16, sample_mode=mode)
        r["discarded_first_window"] = r_warm
        name = f"{variant}_b{B}" + ("" if mode == "separate"
                                    else f"_{mode}gather")
        results[name] = r
        print(f"[audit] steady {name}: "
              f"{r['b512_equiv_updates_per_sec']} b512-eq/s "
              f"(discarded window: "
              f"{r_warm['b512_equiv_updates_per_sec']})", flush=True)
        gc.collect()
    return results


def trace_update_burst():
    """Profile an update-only chunk burst; summarize with xprof if the
    tunnel delivers device traces."""
    import glob

    import jax.numpy as jnp

    from border_tpu.agents import DQN, DQNConfig
    from border_tpu.envs import make
    from border_tpu.models import AtariCNN
    from border_tpu.replay import FrameReplayBuffer
    from border_tpu.train import Trainer, TrainerConfig

    agent = DQN(DQNConfig(model=lambda n: AtariCNN(out_dim=n), lr=1e-4,
                          double_dqn=True, soft_update_interval=2_000,
                          tau=1.0))
    cfg = TrainerConfig(num_envs=1024, steps_per_chunk=32, batch_size=512,
                        opt_interval=64, warmup_period=0, max_opts=10**9)
    buf = FrameReplayBuffer(capacity=256, num_envs=1024)
    tr = Trainer(make("Pong-v0"), agent, buf, cfg)
    key = jax.random.PRNGKey(0)
    agent_state, vec_state, buf_state = tr.init_states(key, key)
    # compile + warm both programs outside the trace
    out = tr._chunk(agent_state, vec_state, buf_state, key, True, False)
    jax.block_until_ready(out)
    agent_state, buf_state = out[0], out[2]

    logdir = os.path.join(ART, "profile_trace")
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    for i in range(3):
        key, k = jax.random.split(key)
        out = tr._chunk(agent_state, vec_state, buf_state, k, True, False)
        agent_state, buf_state = out[0], out[2]
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    planes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                       recursive=True)
    summary = {"xplane_files": planes, "tools": {}}
    if planes:
        try:
            from tensorboard_plugin_profile.convert import raw_to_tool_data
        except Exception:
            raw_to_tool_data = None
            summary["tools"]["error"] = "tensorboard_plugin_profile import failed"
        if raw_to_tool_data is not None:
            for tool in ("op_profile", "framework_op_stats^",
                         "overview_page^"):
                try:
                    data = raw_to_tool_data.xspace_to_tool_data(
                        [planes[-1]], tool, {})
                    if isinstance(data, tuple):
                        data = data[0]
                    if isinstance(data, bytes):
                        data = data.decode("utf-8", "replace")
                    out_name = tool.strip("^").replace("/", "_")
                    with open(os.path.join(
                            logdir, f"{out_name}.json"), "w") as f:
                        f.write(data if isinstance(data, str)
                                else json.dumps(data))
                    summary["tools"][tool] = f"profile_trace/{out_name}.json"
                except Exception as e:  # noqa: BLE001
                    summary["tools"][tool] = f"failed: {e!r}"
    return summary


def main() -> None:
    t_start = time.time()
    meta = {"device": str(jax.devices()), "started": time.strftime("%F %T")}

    # 1. decomposition (the highest-leverage artifact)
    import update_decomposition

    r = phase("update_decomposition", update_decomposition.main)
    if r is not None:
        save("update_decomposition.json",
             {"metric": "update_decomposition", **meta, "results": r})

    # 2. steady-state variant reconciliation
    r = phase("inscan_steady", steady_inscan)
    if r is not None:
        save("update_variants_inscan_steady.json",
             {"metric": "update_variants_inscan_steady", **meta,
              "protocol": "per cell: one discarded 4-chunk window, then a "
                          "timed 16-chunk window (full chunks: env+update)",
              "results": r})

    # 3. per-op single-dispatch timings + cost analysis
    import profile_update

    r = phase("profile_update", profile_update.main)
    if r is not None:
        save("profile_update.json",
             {"metric": "profile_update", **meta, "results": r})

    # 4. profiler trace (best-effort; before the gather sweep, whose OOM
    # poisoned the backend for the rest of the first r4 run)
    r = phase("profiler_trace", trace_update_burst)
    if r is not None:
        save("profile_trace_summary.json",
             {"metric": "profile_trace", **meta, "results": r})

    # 5. frame-gather crossover sweep
    import frame_gather_bench

    r = phase("frame_gather_sweep", frame_gather_bench.main)
    if r is not None:
        save("frame_gather_sweep.json",
             {"metric": "frame_gather_sweep", **meta, "results": r})

    print(f"[audit] ALL DONE in {time.time() - t_start:.0f}s", flush=True)


if __name__ == "__main__":
    main()
