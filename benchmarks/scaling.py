"""Scaling-efficiency measurement over a device mesh.

≙ BASELINE.md target: env-steps/s at 1 chip / 1 host / N hosts with ≥80%
efficiency.  Runs the sharded actor-learner chunk on meshes of growing size
and reports per-size throughput + efficiency vs linear scaling
(≙ the reference's AsyncTrainStat throughput reporting,
border-async-trainer/src/async_trainer/stat.rs:1-27 — the reference itself
never measures scaling; it has no multi-node backend, SURVEY.md §5.8).

On a real pod slice this measures ICI scaling; on the virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8) it validates the
sharded program's correctness and host-side overhead only.

Usage:
    python benchmarks/scaling.py [--env CartPole-v1] [--chunks 10]
    python benchmarks/scaling.py --config pixel          # Pong + CNN +
        FrameReplayBuffer — the frame-scale sharded path
    python benchmarks/scaling.py --multiprocess 2        # N processes ×
        (devices/N) virtual CPU devices each, joined via
        jax.distributed.initialize + gloo — the multi-HOST measurement
        path (one process per host on a real pod; ≙ VERDICT r1 missing #2)
    python benchmarks/scaling.py --out SCALING_r03.json --gate 0.8
        # write the artifact and exit non-zero below 80% efficiency at the
        # largest mesh (VERDICT r2 next #4)

Import-safe: argument parsing and all jax initialization happen only under
``__main__`` (pytest collection or tooling importing this module touches
neither argv nor a backend).
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="CartPole-v1")
    p.add_argument("--config", choices=["mlp", "pixel"], default="mlp",
                   help="mlp: DQN+MLP on --env; pixel: DQN+AtariCNN on "
                        "Pong with the frame-dedup replay")
    p.add_argument("--chunks", type=int, default=10)
    p.add_argument("--envs-per-dev", type=int, default=512)
    p.add_argument("--mode", choices=["weak", "constant-work"],
                   default="weak",
                   help="weak: fixed work PER DEVICE (true scaling — "
                        "meaningful on real chips, where each device adds "
                        "compute); constant-work: fixed TOTAL work spread "
                        "over more shards (the sharding-overhead "
                        "measurement a virtual CPU mesh can certify — "
                        "virtual devices share the host cores, so weak "
                        "efficiency there measures oversubscription, not "
                        "the program)")
    p.add_argument("--multiprocess", type=int, default=1,
                   help="split the measurement over N OS processes "
                        "(CPU: gloo backend; pods: one process per host)")
    p.add_argument("--devices", type=int, default=8,
                   help="total virtual CPU devices in --multiprocess mode")
    p.add_argument("--out", default="", help="write results JSON here")
    p.add_argument("--gate", type=float, default=0.0,
                   help="exit non-zero if efficiency at the largest mesh "
                        "size falls below this fraction")
    p.add_argument("--worker", type=int, default=-1, help=argparse.SUPPRESS)
    p.add_argument("--port", type=int, default=0, help=argparse.SUPPRESS)
    return p.parse_args(argv)


def launch_multiprocess(args):
    """Spawn N workers over gloo and relay process 0's JSON line.
    Runs jax-free in the parent so it never claims a backend/chip."""
    import socket

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--worker", str(i), "--multiprocess", str(args.multiprocess),
             "--port", str(port), "--devices", str(args.devices),
             "--env", args.env, "--config", args.config,
             "--chunks", str(args.chunks),
             "--envs-per-dev", str(args.envs_per_dev)],
            stdout=subprocess.PIPE,
            stderr=(None if os.environ.get('SCALING_DEBUG') else subprocess.DEVNULL),
            text=True,
            env=env,
        )
        for i in range(args.multiprocess)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        if out.strip():
            print(out.strip())
            outputs.append(out.strip().splitlines()[-1])
        assert p.returncode == 0, "worker failed"
    return outputs


def _configure_jax():
    import jax

    # the ambient sitecustomize force-registers the TPU backend over
    # JAX_PLATFORMS; honor the env var programmatically so CPU-mesh sweeps
    # never claim the chip
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from border_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache(
        ".jax_cache" if jax.default_backend() != "cpu" else ".jax_cache_cpu"
    )
    return jax


def measure(n_dev: int, args) -> float:
    import jax

    from border_tpu.agents import DQN, DQNConfig
    from border_tpu.envs import make
    from border_tpu.parallel import ShardedTrainer, make_mesh
    from border_tpu.replay import FrameReplayBuffer, ReplayBuffer
    from border_tpu.train import TrainerConfig

    mesh = make_mesh(("actors",), devices=jax.devices()[:n_dev])
    # constant-work: total envs/batch fixed at the full-mesh size, so
    # larger meshes shard the SAME program — throughput should stay flat
    # if sharding adds no overhead
    n_max = jax.device_count() if args.mode == "constant-work" else n_dev
    if args.config == "pixel":
        from border_tpu.models import AtariCNN

        env = make("Pong-v0")
        agent = DQN(DQNConfig(model=lambda n: AtariCNN(out_dim=n),
                              double_dqn=True, lr=1e-4))
        envs_per_dev = min(args.envs_per_dev, 128)
        num_envs = envs_per_dev * n_max
        buffer = FrameReplayBuffer(capacity=128, num_envs=num_envs)
        cfg = TrainerConfig(
            num_envs=num_envs, steps_per_chunk=16,
            batch_size=64 * n_max, opt_interval=256,
            warmup_period=0, max_opts=10**9,
        )
    else:
        env = make(args.env)
        agent = DQN(DQNConfig(double_dqn=True))
        buffer = ReplayBuffer(capacity=16_384)
        cfg = TrainerConfig(
            num_envs=args.envs_per_dev * n_max,
            steps_per_chunk=64,
            batch_size=256 * n_max,
            opt_interval=256,
            warmup_period=0,
            max_opts=10**9,
        )
    tr = ShardedTrainer(env, agent, buffer, cfg, mesh=mesh)
    key = jax.random.PRNGKey(0)
    agent_state, vec_state, buf_state = tr.init_states(key, key)
    out = tr._chunk(agent_state, vec_state, buf_state, key, True)
    jax.block_until_ready(out[0])
    agent_state, vec_state, buf_state = out[0], out[1], out[2]
    t0 = time.perf_counter()
    for _ in range(args.chunks):
        key, k = jax.random.split(key)
        out = tr._chunk(agent_state, vec_state, buf_state, k, True)
        agent_state, vec_state, buf_state = out[0], out[1], out[2]
    # honest sync: device_get a leaf (axon dispatch is deeply async —
    # see bench.py timing methodology)
    jax.device_get(jax.tree.leaves(agent_state)[0])
    jax.block_until_ready(agent_state)
    dt = time.perf_counter() - t0
    return args.chunks * cfg.steps_per_chunk * cfg.num_envs / dt


def run_worker(args):
    """One process of the multi-process measurement: the whole global mesh
    runs one sharded program; process 0 reports."""
    import jax

    eps = measure(jax.device_count(), args)
    if jax.process_index() == 0:
        print(json.dumps({
            "metric": "scaling_multiprocess",
            "env": args.env,
            "config": args.config,
            "processes": jax.process_count(),
            "global_devices": jax.device_count(),
            "env_steps_per_sec": round(eps),
        }))


def main(args):
    import jax

    n_total = jax.device_count()
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_total]
    results = {}
    base = None
    for n in sizes:
        eps = measure(n, args)
        if base is None:
            base = eps
        # weak: efficiency vs linear scaling of per-device work;
        # constant-work: retention of the 1-device throughput
        eff = eps / (base * n) if args.mode == "weak" else eps / base
        results[str(n)] = {"env_steps_per_sec": round(eps),
                           "efficiency": round(eff, 3)}
        print(f"devices={n:>2}  {eps:>14,.0f} env-steps/s  "
              f"efficiency={eff:.1%}")
    payload = {"metric": "scaling", "env": args.env, "config": args.config,
               "mode": args.mode, "platform": jax.default_backend(),
               "devices_available": n_total, "results": results}
    print(json.dumps(payload))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)
    if args.gate:
        eff_last = results[str(sizes[-1])]["efficiency"]
        if eff_last < args.gate:
            print(f"GATE FAIL: efficiency {eff_last:.1%} < {args.gate:.0%} "
                  f"at {sizes[-1]} devices", file=sys.stderr)
            return 1
    return 0


if __name__ == "__main__":
    ARGS = parse_args()
    if ARGS.multiprocess > 1 and ARGS.worker < 0:
        launch_multiprocess(ARGS)
        sys.exit(0)
    if ARGS.worker >= 0:
        # multiprocess bootstrap: must precede any jax backend touch
        os.environ["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count="
            f"{ARGS.devices // ARGS.multiprocess}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
        from border_tpu.parallel import init_distributed

        init_distributed(
            f"localhost:{ARGS.port}", ARGS.multiprocess, ARGS.worker
        )
        _configure_jax()
        run_worker(ARGS)
        sys.exit(0)
    _configure_jax()
    sys.exit(main(ARGS))
