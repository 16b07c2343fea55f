"""Offline RL (BC / AWAC / IQL) on a collected Pendulum corpus.

≙ examples/d4rl/{bc,awac,iql}_pen: dataset → replay buffer → train_offline →
normalized-score evaluation (border-minari/src/evaluator.rs:26-63).  The
corpus is synthesized locally (a mediocre SAC policy's rollouts) since this
environment has no network access for Minari downloads; ``--dataset`` loads
any .npz corpus instead.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from border_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()  # <repo>/.jax_cache, derived from the checkout

from border_tpu.agents import AWAC, AWACConfig, BC, BCConfig, IQL, IQLConfig, SAC, SACConfig
from border_tpu.core.env import VecEnv
from border_tpu.data import NormalizedEvaluator, OfflineDataset, collect_dataset
from border_tpu.envs import make
from border_tpu.record import BufferedRecorder
from border_tpu.replay import ReplayBuffer
from border_tpu.train import OfflineTrainer, Trainer, TrainerConfig, Evaluator

# Pendulum score range for normalized-score reporting (D4RL convention):
REF_MIN, REF_MAX = -1600.0, -150.0


def build_corpus(path: str, n_steps: int, seed: int) -> OfflineDataset:
    """Train a quick SAC behavior policy, then record its rollouts."""
    env = make("Pendulum-v1")
    agent = SAC(SACConfig(actor_hidden=(64, 64), critic_hidden=(64, 64)))
    cfg = TrainerConfig(
        max_opts=3_000, warmup_period=1_000, opt_interval=16, batch_size=128,
        num_envs=64, steps_per_chunk=32, eval_interval=10**9, seed=seed,
    )
    tr = Trainer(env, agent, ReplayBuffer(capacity=65_536), cfg)
    res = tr.train()
    ds = collect_dataset(env, agent, res.agent_state, n_steps=n_steps, num_envs=64, seed=seed)
    ds.save_npz(path)
    return ds


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--algo", choices=["bc", "awac", "iql"], default="iql")
    p.add_argument("--dataset", type=str, default="")
    p.add_argument("--corpus-steps", type=int, default=200_000)
    p.add_argument("--max-opts", type=int, default=30_000)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    env = make("Pendulum-v1")
    vec = VecEnv(env, 1)
    if args.dataset and os.path.exists(args.dataset):
        ds = OfflineDataset.from_npz(args.dataset)
    else:
        path = args.dataset or "/tmp/pendulum_corpus.npz"
        print(f"building behavior corpus → {path}")
        ds = build_corpus(path, args.corpus_steps, args.seed)
    print(f"dataset: {len(ds)} transitions")

    buffer = ReplayBuffer(capacity=max(262_144, 1 << (len(ds) - 1).bit_length()))
    buf_state = ds.to_replay_buffer(buffer)

    if args.algo == "bc":
        agent = BC(BCConfig(hidden=(256, 256)))
    elif args.algo == "awac":
        agent = AWAC(AWACConfig())
    else:
        agent = IQL(IQLConfig())
    key = jax.random.PRNGKey(args.seed)
    agent_state = agent.init(key, vec.observation_space, vec.action_space)

    cfg = TrainerConfig(max_opts=args.max_opts, batch_size=256,
                        eval_interval=5_000, seed=args.seed)
    evaluator = NormalizedEvaluator(
        env, n_episodes=10, max_steps=200, ref_min=REF_MIN, ref_max=REF_MAX
    )
    rec = BufferedRecorder()
    tr = OfflineTrainer(agent, buffer, cfg, recorder=rec, evaluator=evaluator,
                        updates_per_chunk=500)
    res = tr.train(agent_state, buf_state)
    print(f"{args.algo}: best eval return={res.best_score:.1f}  opt/s={res.opt_per_sec:,.0f}")
    for step, score in res.eval_history:
        from border_tpu.data import normalized_score
        print(f"  opt {step:>6d}: return {score:+.1f}  "
              f"normalized {normalized_score(score, REF_MIN, REF_MAX):.1f}")


if __name__ == "__main__":
    main()
