"""Generate the committed offline corpora (network-free D4RL analogue).

≙ the role of Minari's hosted datasets in the reference's offline examples
(examples/d4rl/{bc,awac,iql}_pen): since this environment has no network
access, a "pendulum-medium" corpus is synthesized by training SAC partway
and logging its *stochastic* rollouts — the standard D4RL "medium" recipe
(medium = early-stopped policy + its exploration noise).

Writes artifacts/datasets/pendulum-medium-v0.npz + .json metadata
(env id, D4RL ref_min/ref_max, behavior-policy return) consumed by
border_tpu.data.MinariDataset's local registry.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if jax.default_backend() == "cpu":
    cache = "/root/repo/.jax_cache_cpu"
else:
    cache = "/root/repo/.jax_cache"
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np

from border_tpu.agents import SAC, SACConfig
from border_tpu.data import collect_dataset
from border_tpu.envs import make
from border_tpu.replay import ReplayBuffer
from border_tpu.train import Evaluator, Trainer, TrainerConfig

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "artifacts", "datasets")

# D4RL-convention reference returns for Pendulum-v1 (no published D4RL
# pendulum refs exist; these are the measured random-policy and
# near-expert-SAC returns on this implementation)
REF_MIN = -1200.0
REF_MAX = -130.0


def main():
    env = make("Pendulum-v1")
    agent = SAC(SACConfig(actor_hidden=(128, 128), critic_hidden=(128, 128),
                          n_critics=2, ent_coef_mode="auto"))
    # "medium": stop SAC early
    cfg = TrainerConfig(max_opts=3_000, warmup_period=1_000, opt_interval=16,
                        batch_size=128, num_envs=64, steps_per_chunk=32,
                        eval_interval=600, seed=0)
    evaluator = Evaluator(env, n_episodes=10, max_steps=200)
    res = Trainer(env, agent, ReplayBuffer(65_536), cfg,
                  evaluator=evaluator).train()
    print(f"behavior policy (deterministic eval): {res.best_score:.1f}")

    # stochastic rollouts = the dataset (episodes are fixed 200 steps)
    ds = collect_dataset(env, agent, res.agent_state, n_steps=40_000,
                         num_envs=50, seed=1, explore=True)
    n_episodes = int(ds.terminated.sum() + ds.truncated.sum())
    behavior_return = float(ds.reward.sum() / max(n_episodes, 1))
    print(f"dataset: {len(ds)} transitions, {n_episodes} episodes, "
          f"behavior return {behavior_return:.1f}")

    os.makedirs(OUT_DIR, exist_ok=True)
    ds.save_npz(os.path.join(OUT_DIR, "pendulum-medium-v0.npz"))
    with open(os.path.join(OUT_DIR, "pendulum-medium-v0.json"), "w") as f:
        json.dump({
            "dataset_id": "pendulum-medium-v0",
            "env": "Pendulum-v1",
            "ref_min": REF_MIN,
            "ref_max": REF_MAX,
            "behavior_return": behavior_return,
            "behavior_eval_return": float(res.best_score),
            "n_transitions": len(ds),
        }, f, indent=1)
    print("written to", OUT_DIR)


if __name__ == "__main__":
    main()
