"""DQN trained on REAL external Gymnasium environments (PyVecEnv).

≙ the reference's border-py-gym-env training path
(border-py-gym-env/src/base.rs:268-340; examples/gym/dqn_cartpole): the
reference drives Gymnasium through embedded CPython from its actor
threads; here N ``gymnasium.make`` envs run behind
:class:`border_tpu.envs.PyVecEnv` on the host-env interface, feeding the
device learner through the double-buffered :class:`HostEnvTrainer`
pipeline.  Works with any Gymnasium env whose spaces map to Box/Discrete.

    python examples/dqn_gymnasium.py --env CartPole-v1 --max-opts 2000
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from border_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()  # <repo>/.jax_cache, derived from the checkout

from border_tpu.agents import DQN, DQNConfig
from border_tpu.envs import PyVecEnv
from border_tpu.record import BufferedRecorder
from border_tpu.replay import ReplayBuffer
from border_tpu.train import HostEnvTrainer, HostEvaluator, TrainerConfig


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="CartPole-v1")
    p.add_argument("--num-envs", type=int, default=16)
    p.add_argument("--max-opts", type=int, default=2_000)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    cfg = TrainerConfig(
        max_opts=args.max_opts, warmup_period=500, opt_interval=8,
        batch_size=args.batch_size, num_envs=args.num_envs,
        steps_per_chunk=16, eval_interval=max(args.max_opts // 5, 1),
        seed=args.seed,
    )
    env = PyVecEnv.gym(args.env, args.num_envs, seed=args.seed)
    evaluator = HostEvaluator(
        lambda n, seed: PyVecEnv.gym(args.env, n, seed=seed),
        n_episodes=5, max_steps=1_000,
    )
    rec = BufferedRecorder()
    trainer = HostEnvTrainer(
        env,
        DQN(DQNConfig(hidden=(64, 64), lr=args.lr, double_dqn=True,
                      eps_final_step=8 * args.max_opts)),
        ReplayBuffer(50_000), cfg, recorder=rec, evaluator=evaluator,
    )
    res = trainer.train()
    print(f"best eval return {res.best_score:.1f}  "
          f"samples/s {res.samples_per_sec:,.0f}  "
          f"opt/s {res.opt_per_sec:.1f}")
    for opt, score in res.eval_history:
        print(f"  opt {opt:>8d}: {score:+.1f}")


if __name__ == "__main__":
    main()
