"""Decoupled actor-learner DQN on Pong — Border's async semantics.

≙ examples/atari/dqn_atari_async_tch via border-async-trainer: actors
sample with *stale* policy params refreshed every ``--sync-interval``
optimizer steps (SyncModel, border-async-trainer/src/sync_model.rs:1-13),
letting the update:sample ratio float — unlike the fused synchronous
Trainer (examples/dqn_pong.py) which pins it.  Here the actor phase and
learner burst alternate as two jitted programs over shared HBM state;
on a mesh, combine with ShardedAsyncTrainer (border_tpu.parallel).
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
from border_tpu.models import AtariCNN
from border_tpu.record import BufferedRecorder
from border_tpu.replay import FrameReplayBuffer
from border_tpu.train import AsyncTrainer, Evaluator, TrainerConfig


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--max-opts", type=int, default=50_000)
    p.add_argument("--num-envs", type=int, default=1024)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--opt-interval", type=int, default=64)
    p.add_argument("--sync-interval", type=int, default=512,
                   help="actor param refresh cadence in opt steps "
                        "(≙ AsyncTrainerConfig::sync_interval)")
    p.add_argument("--out", type=str, default="/tmp/border_tpu_async_pong")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    env = make("Pong-v0")
    agent = DQN(DQNConfig(model=lambda n: AtariCNN(out_dim=n), lr=1e-4,
                          double_dqn=True, soft_update_interval=2_000,
                          tau=1.0, eps_final_step=2_000_000))
    cfg = TrainerConfig(
        max_opts=args.max_opts, warmup_period=50_000,
        opt_interval=args.opt_interval, batch_size=args.batch_size,
        num_envs=args.num_envs, steps_per_chunk=32,
        eval_interval=2_000, sync_interval=args.sync_interval,
        seed=args.seed,
    )
    buffer = FrameReplayBuffer(capacity=512, num_envs=args.num_envs)
    recorder = BufferedRecorder(model_dir=args.out)
    evaluator = Evaluator(make("Pong-v0", train=False), n_episodes=5,
                          max_steps=3_000)
    res = AsyncTrainer(env, agent, buffer, cfg, recorder, evaluator).train()
    print(f"best eval return={res.best_score:+.1f}  "
          f"samples/s={res.samples_per_sec:,.0f}  "
          f"opt/s={res.opt_per_sec:,.1f}")
    for step, score in res.eval_history:
        print(f"  opt {step:>8d}: eval return {score:+.1f}")


if __name__ == "__main__":
    main()
