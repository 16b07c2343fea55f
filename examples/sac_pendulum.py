"""SAC on Pendulum-v1 — continuous-control parity config.

≙ examples/gym/sac_pendulum: squashed Gaussian actor, 2-critic min-Q,
automatic entropy tuning.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from border_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()  # <repo>/.jax_cache, derived from the checkout

from border_tpu.agents import SAC, SACConfig
from border_tpu.envs import make
from border_tpu.record import BufferedRecorder, TensorboardRecorder
from border_tpu.replay import ReplayBuffer
from border_tpu.train import Evaluator, Trainer, TrainerConfig


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--max-opts", type=int, default=20_000)
    p.add_argument("--num-envs", type=int, default=128)
    p.add_argument("--opt-interval", type=int, default=16)
    p.add_argument("--out", type=str, default="/tmp/border_tpu_sac")
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    env = make("Pendulum-v1")
    agent = SAC(
        SACConfig(
            actor_hidden=(128, 128),
            critic_hidden=(128, 128),
            n_critics=2,
            actor_lr=3e-4,
            critic_lr=3e-4,
            ent_coef_mode="auto",
        )
    )
    cfg = TrainerConfig(
        max_opts=args.max_opts,
        warmup_period=1_000,
        opt_interval=args.opt_interval,
        batch_size=128,
        num_envs=args.num_envs,
        steps_per_chunk=32,
        eval_interval=2_000,
        eval_episodes=5,
        seed=args.seed,
    )
    recorder = (
        TensorboardRecorder(args.out)
        if args.tensorboard
        else BufferedRecorder(model_dir=args.out)
    )
    evaluator = Evaluator(env, n_episodes=5, max_steps=200)
    result = Trainer(
        env, agent, ReplayBuffer(capacity=65_536), cfg, recorder, evaluator
    ).train()
    print(f"best eval return={result.best_score:.1f}  "
          f"samples/s={result.samples_per_sec:,.0f}")
    for step, score in result.eval_history:
        print(f"  opt {step:>6d}: eval return {score:+.1f}")


if __name__ == "__main__":
    main()
