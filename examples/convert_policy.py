"""Train → export → run backend-free: the deployment path.

≙ the reference's convert_policy + pendulum_std pair
(examples/gym/convert_policy/src/main.rs:1-235 converts a trained tch SAC
policy to the dependency-free Mat/Mlp bincode format;
examples/gym/pendulum_std/src/main.rs:115-173 runs it with zero DL
backend).  Here: SAC trains briefly on Pendulum, ``export_policy`` writes
policy.npz + policy.json, ``NumpyMLPPolicy`` reloads them, and the episode
rollout runs **numpy-only inference against the native C++ envpool** — no
JAX anywhere in the deployed loop.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from border_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()  # <repo>/.jax_cache, derived from the checkout

import numpy as np

from border_tpu.agents import SAC, SACConfig
from border_tpu.envs import make
from border_tpu.replay import ReplayBuffer
from border_tpu.train import Evaluator, Trainer, TrainerConfig
from border_tpu.utils import NumpyMLPPolicy, export_policy


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--max-opts", type=int, default=20_000)
    p.add_argument("--out", type=str, default="/tmp/border_tpu_convert")
    p.add_argument("--episodes", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    # 1. train (≙ the tch SAC pendulum training the reference converts)
    env = make("Pendulum-v1")
    agent = SAC(SACConfig(actor_hidden=(64, 64), critic_hidden=(64, 64),
                          ent_coef_mode="auto"))
    cfg = TrainerConfig(max_opts=args.max_opts, warmup_period=1_000,
                        opt_interval=16, batch_size=128, num_envs=128,
                        steps_per_chunk=32, eval_interval=2_000,
                        seed=args.seed)
    res = Trainer(env, agent, ReplayBuffer(65_536), cfg,
                  evaluator=Evaluator(env, 5, 200)).train()
    print(f"trained: best eval return {res.best_score:.1f}")

    # 2. convert (≙ convert_policy main.rs: varstore → Mat/Mlp → bincode)
    path = export_policy(agent, res.agent_state, args.out)
    print("exported:", sorted(os.listdir(path)))

    # 3. deploy: numpy-only inference on the native C++ envs
    #    (≙ pendulum_std main.rs:115-173 — zero DL backend in the loop)
    policy = NumpyMLPPolicy(path)
    from border_tpu.envs.native import NativeVecEnv, native_available

    if not native_available():
        print("native envpool unavailable; skipping deployment rollout")
        return
    native = NativeVecEnv("Pendulum-v1", args.episodes, seed=args.seed)
    n_bins = native.num_actions
    obs = native.reset()
    returns = np.zeros(args.episodes)
    running = np.ones(args.episodes, bool)
    for _ in range(200):
        u = policy(obs)  # numpy forward, [N, 1] torque in [-2, 2]
        bins = np.clip(
            np.round((u[:, 0] + 2.0) / 4.0 * (n_bins - 1)), 0, n_bins - 1
        ).astype(np.int32)
        obs, rew, term, trunc = native.step(bins)
        returns += rew * running
        running &= ~(term | trunc)
    native.close()
    print(f"numpy-only deployment on C++ envs: mean return "
          f"{returns.mean():.1f} over {args.episodes} episodes "
          f"(binned torque, {n_bins} levels)")


if __name__ == "__main__":
    main()
