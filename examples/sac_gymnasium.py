"""SAC (continuous control) trained on REAL external Gymnasium envs.

≙ the reference's sac_pendulum example end to end
(examples/gym/sac_pendulum/src/main.rs + the GymEnv training path,
border-py-gym-env/src/base.rs:268-340): float actions flow host-ward
through :class:`border_tpu.envs.PyVecEnv`, external envs step in host
threads behind the double-buffered :class:`HostEnvTrainer` pipeline, and
the device runs the fused SAC update bursts.  Dict-obs envs (robotics
style) are flattened built-in by PyVecEnv.

    python examples/sac_gymnasium.py --env Pendulum-v1 --max-opts 20000

The committed 3-seed gate evidence for this exact shape is
``artifacts/pendulum_host_curve*.json`` (target −200, fresh
best-checkpoint evals; regenerate via
``python benchmarks/learning.py pendulum_host --cpu``).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from border_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()  # <repo>/.jax_cache, derived from the checkout

from border_tpu.agents import SAC, SACConfig
from border_tpu.envs import PyVecEnv
from border_tpu.record import BufferedRecorder
from border_tpu.replay import ReplayBuffer
from border_tpu.train import HostEnvTrainer, HostEvaluator, TrainerConfig


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="Pendulum-v1")
    p.add_argument("--num-envs", type=int, default=32)
    p.add_argument("--max-opts", type=int, default=20_000)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--max-episode-steps", type=int, default=200)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (MLP-scale SAC runs fine "
                        "on CPU while a chip is busy)")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        enable_compilation_cache(".jax_cache_cpu")

    cfg = TrainerConfig(
        max_opts=args.max_opts, warmup_period=1_000, opt_interval=8,
        batch_size=args.batch_size, num_envs=args.num_envs,
        steps_per_chunk=32, eval_interval=max(args.max_opts // 10, 1),
        seed=args.seed,
    )
    env = PyVecEnv.gym(args.env, args.num_envs, seed=args.seed)
    evaluator = HostEvaluator(
        lambda n, seed: PyVecEnv.gym(args.env, n, seed=seed),
        n_episodes=10, max_steps=args.max_episode_steps,
    )
    agent = SAC(SACConfig(actor_hidden=(128, 128), critic_hidden=(128, 128),
                          n_critics=2, actor_lr=args.lr, critic_lr=args.lr,
                          ent_coef_mode="auto"))
    rec = BufferedRecorder()
    trainer = HostEnvTrainer(env, agent, ReplayBuffer(65_536), cfg,
                             recorder=rec, evaluator=evaluator)
    res = trainer.train()
    trainer.env.close()
    print(f"best eval return: {res.best_score:+.1f}  "
          f"({res.env_steps:,} env steps, {res.opt_steps:,} updates, "
          f"{res.samples_per_sec:,.0f} samples/s)")
    for step, score in res.eval_history:
        print(f"  opt {step:>8d}: {score:+.1f}")


if __name__ == "__main__":
    main()
