"""DQN on the native C++ envpool CartPole — the host-env architecture.

≙ the reference's Atari path: C++ envs on host threads feeding a device
learner (border-atari-env/src/atari_env/ale.rs:62-100 + actor threads,
border-async-trainer/src/actor/base.rs:120-178).  The C++ pool steps
``--num-envs`` CartPole instances in worker threads while the chip runs the
update burst; ``host_wait_frac`` in the records shows how much host env
time the double-buffered pipeline actually hides.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from border_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()  # <repo>/.jax_cache, derived from the checkout

from border_tpu.agents import DQN, DQNConfig
from border_tpu.record import BufferedRecorder
from border_tpu.replay import ReplayBuffer
from border_tpu.train import HostEnvTrainer, HostEvaluator, TrainerConfig


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--max-opts", type=int, default=5_000)
    p.add_argument("--num-envs", type=int, default=64)
    p.add_argument("--opt-interval", type=int, default=16)
    p.add_argument("--n-threads", type=int, default=0, help="0 = auto")
    p.add_argument("--out", type=str, default="/tmp/border_tpu_native")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    agent = DQN(DQNConfig(hidden=(64, 64), lr=1e-3, tau=0.01,
                          soft_update_interval=1, double_dqn=True,
                          eps_final_step=50_000))
    cfg = TrainerConfig(
        max_opts=args.max_opts, warmup_period=1_000,
        opt_interval=args.opt_interval, batch_size=64,
        num_envs=args.num_envs, steps_per_chunk=16,
        eval_interval=1_000, seed=args.seed,
    )
    recorder = BufferedRecorder(model_dir=args.out)
    trainer = HostEnvTrainer(
        "CartPole-v1", agent, ReplayBuffer(16_384), cfg, recorder=recorder,
        evaluator=HostEvaluator("CartPole-v1", n_episodes=5, max_steps=500),
        n_threads=args.n_threads or None,
    )
    res = trainer.train()
    print(f"best eval return={res.best_score:.1f}  "
          f"samples/s={res.samples_per_sec:,.0f}")
    waits = [
        r.get_scalar(k)
        for r in recorder.records
        for k, _ in r
        if k.startswith("host_wait_frac_mean")
    ]
    if waits:
        print(f"host env wait fraction (mean of means): "
              f"{sum(waits)/len(waits):.3f}")
    for step, score in res.eval_history:
        print(f"  opt {step:>6d}: eval return {score:+.1f}")


if __name__ == "__main__":
    main()
