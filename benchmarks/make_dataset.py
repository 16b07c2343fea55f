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


class ScriptedReacherPolicy:
    """Jacobian-transpose reaching controller on the goal-dict obs —
    the scripted data-collection policy for the dict-obs corpus
    (≙ the role of D4RL's scripted/partially-trained collectors behind
    pointmaze/fetch datasets, border-minari/src/d4rl/**).

    τ = Jᵀ(goal − ee)·kp − kd·q̇ + 𝒩(0, σ) — σ sets the corpus quality
    ("medium" ≈ σ 0.6).  kp keeps torques mostly unsaturated so the
    clipped-noise action mean stays ≈ the deterministic controller (a
    saturating collector would bias BC's regression target toward 0)."""

    def __init__(self, kp: float = 2.5, kd: float = 0.25, sigma: float = 0.3):
        self.kp, self.kd, self.sigma = kp, kd, sigma

    def _torque(self, obs):
        import jax.numpy as jnp

        from border_tpu.envs.reacher import L1, L2

        q = obs["observation"][..., :2]
        qd = obs["observation"][..., 2:]
        err = obs["desired_goal"] - obs["achieved_goal"]  # [..., 2]
        q1, q12 = q[..., 0], q[..., 0] + q[..., 1]
        s1, c1 = jnp.sin(q1), jnp.cos(q1)
        s12, c12 = jnp.sin(q12), jnp.cos(q12)
        # J = [[-L1 s1 - L2 s12, -L2 s12], [L1 c1 + L2 c12, L2 c12]]
        jt_row0 = jnp.stack([-L1 * s1 - L2 * s12, L1 * c1 + L2 * c12], -1)
        jt_row1 = jnp.stack([-L2 * s12, L2 * c12], -1)
        tau = jnp.stack(
            [jnp.sum(jt_row0 * err, -1), jnp.sum(jt_row1 * err, -1)], -1
        )
        return jnp.clip(self.kp * tau - self.kd * qd, -1.0, 1.0)

    def select_action(self, agent_state, obs, key):
        import jax
        import jax.numpy as jnp

        tau = self._torque(obs)
        noise = self.sigma * jax.random.normal(key, tau.shape, jnp.float32)
        return jnp.clip(tau + noise, -1.0, 1.0)

    def select_action_eval(self, agent_state, obs, key):
        return self._torque(obs)


def make_fetch_reacher():
    """Generate + commit the goal-dict corpus ``fetch-reacher-medium-v0``
    (raw dict obs; flattened at load by GoalDictConverter — prefix
    "fetch" in the converter registry)."""
    env = make("Reacher-v0")  # dict observations

    def ep_return(sigma, n_steps, seed):
        pol = ScriptedReacherPolicy(sigma=sigma)
        ds = collect_dataset(env, pol, None, n_steps=n_steps, num_envs=50,
                             seed=seed, explore=True)
        n_eps = int(ds.terminated.sum() + ds.truncated.sum())
        return ds, float(np.sum(ds.reward) / max(n_eps, 1))

    # D4RL-convention refs measured on THIS env: random policy / near-
    # expert scripted policy
    _, ref_min = ep_return(sigma=10.0, n_steps=10_000, seed=7)  # ≈ random
    _, ref_max = ep_return(sigma=0.02, n_steps=10_000, seed=8)
    ds, behavior_return = ep_return(sigma=0.6, n_steps=25_000, seed=1)
    print(f"fetch-reacher: ref_min={ref_min:.1f} ref_max={ref_max:.1f} "
          f"behavior={behavior_return:.1f}  ({len(ds)} transitions)")
    assert isinstance(ds.obs, dict)

    os.makedirs(OUT_DIR, exist_ok=True)
    ds.save_npz(os.path.join(OUT_DIR, "fetch-reacher-medium-v0.npz"))
    with open(os.path.join(OUT_DIR, "fetch-reacher-medium-v0.json"), "w") as f:
        json.dump({
            "dataset_id": "fetch-reacher-medium-v0",
            "env": "ReacherGoal-v0",
            "obs": "dict{observation, achieved_goal, desired_goal} (raw)",
            "collector": "ScriptedReacherPolicy(kp=2.5, sigma=0.6) (Jacobian-transpose)",
            "ref_min": ref_min,
            "ref_max": ref_max,
            "behavior_return": behavior_return,
            "n_transitions": len(ds),
        }, f, indent=1)
    print("written to", OUT_DIR)


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("corpus", nargs="?", default="pendulum",
                   choices=["pendulum", "fetch_reacher", "all"])
    which = p.parse_args().corpus
    if which in ("fetch_reacher", "all"):
        make_fetch_reacher()
    if which in ("pendulum", "all"):
        make_pendulum()


def make_pendulum():
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
