"""Multi-process sharded-training worker (driven by test_multiprocess.py).

Each process owns ``ndev_local`` virtual CPU devices; together they form one
global ``actors`` mesh running the identical ShardedTrainer program — the
multi-host analogue of the reference's threads-in-one-process async doctest
(border-async-trainer/src/lib.rs:1-137).  Prints one JSON line with the
final parameter checksum so the driver can assert cross-process replication
and single-process equivalence.

Usage: mp_worker.py <process_id> <num_processes> <port> <ndev_local> [config]

``config``: "mlp" (default — CartPole + flat ReplayBuffer) or "pixel"
(Pong + AtariCNN + FrameReplayBuffer: the flagship data structures on the
multi-process mesh, VERDICT r3 next #8).
"""

import json
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
ndev_local = int(sys.argv[4])
config = sys.argv[5] if len(sys.argv) > 5 else "mlp"

os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={ndev_local}"
)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

from border_tpu.parallel import init_distributed, process_info

if nproc > 1:
    init_distributed(f"localhost:{port}", nproc, pid)

import jax.numpy as jnp

from border_tpu.agents import DQN, DQNConfig
from border_tpu.envs import make
from border_tpu.parallel import ShardedTrainer
from border_tpu.replay import ReplayBuffer
from border_tpu.train import TrainerConfig


def main():
    if config == "pixel":
        from border_tpu.models import AtariCNN
        from border_tpu.replay import FrameReplayBuffer

        env = make("Pong-v0")
        agent = DQN(DQNConfig(model=lambda n: AtariCNN(out_dim=n), lr=1e-4))
        cfg = TrainerConfig(
            num_envs=8,
            steps_per_chunk=8,  # > stack + n_step: real sampleable window
            batch_size=8,
            opt_interval=16,
            warmup_period=0,
            max_opts=4,
            eval_interval=10**9,
            seed=7,
        )
        buffer = FrameReplayBuffer(capacity=16, num_envs=8)
    else:
        env = make("CartPole-v1")
        agent = DQN(DQNConfig(hidden=(8,), lr=1e-3))
        cfg = TrainerConfig(
            num_envs=16,
            steps_per_chunk=4,
            batch_size=16,
            opt_interval=8,
            warmup_period=0,
            max_opts=6,
            eval_interval=10**9,
            seed=7,
        )
        buffer = ReplayBuffer(256)
    tr = ShardedTrainer(env, agent, buffer, cfg)
    res = tr.train()
    checksum = float(
        sum(jnp.sum(x.astype(jnp.float64)) for x in
            jax.tree.leaves(res.agent_state.params))
    )
    print(json.dumps({
        "pid": pid,
        "opt_steps": res.opt_steps,
        "env_steps": res.env_steps,
        "checksum": round(checksum, 10),
        **process_info(),
    }))


if __name__ == "__main__":
    main()
