"""Multi-device actor-learner DQN — the async-trainer parity config.

≙ examples/atari/dqn_atari_async_tch (train_async with N actors + 1
learner): here the actor fleet is the ``actors`` mesh axis of a single
sharded program.  On a 1-chip host this still runs (1-device mesh); on a
pod slice each chip steps its env shard and joins the psum.

Run on the virtual CPU mesh for a scaling demo:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/sharded_dqn.py --env CartPole-v1
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from border_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()  # <repo>/.jax_cache, derived from the checkout

from border_tpu.agents import DQN, DQNConfig
from border_tpu.envs import make
from border_tpu.parallel import ShardedTrainer, make_mesh
from border_tpu.record import BufferedRecorder
from border_tpu.replay import ReplayBuffer
from border_tpu.train import Evaluator, TrainerConfig


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", type=str, default="CartPole-v1")
    p.add_argument("--max-opts", type=int, default=5_000)
    p.add_argument("--envs-per-device", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    n = jax.device_count()
    mesh = make_mesh(("actors",))
    env = make(args.env)
    agent = DQN(DQNConfig(double_dqn=True, lr=1e-3, tau=0.01, eps_final_step=50_000))
    cfg = TrainerConfig(
        max_opts=args.max_opts,
        warmup_period=1_000,
        opt_interval=16,
        batch_size=64 * n,
        num_envs=args.envs_per_device * n,
        steps_per_chunk=32,
        eval_interval=1_000,
        seed=args.seed,
    )
    tr = ShardedTrainer(
        env, agent, ReplayBuffer(capacity=16_384), cfg,
        recorder=BufferedRecorder(),
        evaluator=Evaluator(env, n_episodes=5, max_steps=500),
        mesh=mesh,
    )
    res = tr.train()
    print(f"devices={n}  samples/s={res.samples_per_sec:,.0f}  "
          f"opt/s={res.opt_per_sec:,.1f}  best={res.best_score:.1f}")
    for step, score in res.eval_history:
        print(f"  opt {step:>6d}: eval return {score:.1f}")


if __name__ == "__main__":
    main()
