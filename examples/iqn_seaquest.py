"""IQN on Seaquest — the reference's distributional-RL parity config.

≙ the IQN Atari setup (border-tch-agent/src/iqn/config.rs:56-60): Uniform8
pred/tgt τ-samples, Const32 for acting, quantile Huber loss, CNN ψ feature
extractor (AtariCNN skip_linear ≙ cnn/base.rs skip_linear variant).
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from border_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()  # <repo>/.jax_cache, derived from the checkout

from border_tpu.agents import IQN, IQNConfig
from border_tpu.envs import make
from border_tpu.models import AtariCNN
from border_tpu.record import BufferedRecorder
from border_tpu.replay import FrameReplayBuffer
from border_tpu.train import Evaluator, Trainer, TrainerConfig


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", type=str, default="Seaquest-v0")
    p.add_argument("--max-opts", type=int, default=100_000)
    p.add_argument("--num-envs", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--opt-interval", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--out", type=str, default="/tmp/border_tpu_iqn")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    env = make(args.env)
    eval_env = make(args.env, train=False)
    agent = IQN(
        IQNConfig(
            psi_fn=functools.partial(AtariCNN, out_dim=0, skip_linear=True),
            feature_dim=512,
            n_cos=64,
            hidden=(512,),
            sample_percents_pred="uniform8",
            sample_percents_tgt="uniform8",
            sample_percents_act="const32",
            lr=args.lr,
            soft_update_interval=2_000,
            tau=1.0,
            eps_final_step=2_000_000,
        )
    )
    cfg = TrainerConfig(
        max_opts=args.max_opts,
        warmup_period=50_000,
        opt_interval=args.opt_interval,
        batch_size=args.batch_size,
        num_envs=args.num_envs,
        steps_per_chunk=32,
        eval_interval=5_000,
        eval_episodes=10,
        seed=args.seed,
    )
    buffer = FrameReplayBuffer(capacity=512, num_envs=args.num_envs)
    recorder = BufferedRecorder(model_dir=args.out)
    evaluator = Evaluator(eval_env, n_episodes=10, max_steps=3_000)
    result = Trainer(env, agent, buffer, cfg, recorder, evaluator).train()
    print("=== done ===")
    print(f"opt_steps={result.opt_steps} samples/s={result.samples_per_sec:,.0f}")
    print(f"best eval return={result.best_score:.1f}")
    for step, score in result.eval_history:
        print(f"  opt {step:>8d}: eval return {score:+.1f}")


if __name__ == "__main__":
    main()
