"""SAC on the dict-observation goal-reaching env — the FetchReach parity
config.

≙ examples/gym/sac_fetch_reach: a robotics-style env whose observations
are a Dict {observation, achieved_goal, desired_goal}
(border-py-gym-env's candle dict-obs converters, src/candle/*): here the
pure-JAX Reacher exposes the same dict space and FlattenDictWrapper
concatenates it for the MLP actor/critics (≙ the converter's flattening).
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
from border_tpu.record import BufferedRecorder
from border_tpu.replay import ReplayBuffer
from border_tpu.train import Evaluator, Trainer, TrainerConfig


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--max-opts", type=int, default=20_000)
    p.add_argument("--num-envs", type=int, default=128)
    p.add_argument("--out", type=str, default="/tmp/border_tpu_reacher")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    env = make("ReacherFlat-v0")  # Dict obs flattened for the MLP nets
    agent = SAC(SACConfig(actor_hidden=(128, 128), critic_hidden=(128, 128),
                          n_critics=2, ent_coef_mode="auto"))
    cfg = TrainerConfig(
        max_opts=args.max_opts, warmup_period=1_000, opt_interval=16,
        batch_size=128, num_envs=args.num_envs, steps_per_chunk=32,
        eval_interval=2_000, seed=args.seed,
    )
    recorder = BufferedRecorder(model_dir=args.out)
    evaluator = Evaluator(env, n_episodes=10, max_steps=100)
    res = Trainer(env, agent, ReplayBuffer(65_536), cfg, recorder,
                  evaluator).train()
    print(f"best eval return={res.best_score:.2f}  "
          f"samples/s={res.samples_per_sec:,.0f}")
    for step, score in res.eval_history:
        print(f"  opt {step:>6d}: eval return {score:+.2f}")


if __name__ == "__main__":
    main()
