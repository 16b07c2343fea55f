"""Host-side Gymnasium bridge.

≙ border-py-gym-env (GymEnv over embedded CPython,
border-py-gym-env/src/base.rs:129-474).  Where the reference routes every
training step through CPython, here the bridge exists for *validation and
evaluation only* (SURVEY.md §2.1 item 3): it exposes Gymnasium envs through
the same VecEnv-shaped stepping API so trained policies can be scored
against the canonical implementations, and our pure-JAX dynamics can be
diff-tested step-by-step.

Not jittable — host python per step by construction.  Converter behavior
(obs→f32, seeded resets, terminated/truncated split) matches the
reference's converters + f32_wrapper.py.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import numpy as np


class GymVecBridge:
    """N host Gymnasium envs stepped in lockstep with auto-reset.

    Mirrors the VecEnv contract closely enough for evaluators:
    ``reset(seed) -> obs [N, ...]``, ``step(actions) -> (obs, reward,
    terminated, truncated, final_obs)``.
    """

    def __init__(self, env_id: str, num_envs: int = 1, **kwargs):
        import gymnasium as gym

        self.envs: List[Any] = [gym.make(env_id, **kwargs) for _ in range(num_envs)]
        self.num_envs = num_envs
        self.env_id = env_id

    def reset(self, seed: int = 0) -> np.ndarray:
        obs = [e.reset(seed=seed + i)[0] for i, e in enumerate(self.envs)]
        self._ep_seed = seed + self.num_envs
        return np.asarray(obs, np.float32)

    def step(self, actions) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        obs, rew, term, trunc, final = [], [], [], [], []
        for e, a in zip(self.envs, np.asarray(actions)):
            o, r, t, tr, _ = e.step(a)
            final.append(np.asarray(o, np.float32))
            if t or tr:
                o = e.reset(seed=self._ep_seed)[0]
                self._ep_seed += 1
            obs.append(np.asarray(o, np.float32))
            rew.append(r)
            term.append(t)
            trunc.append(tr)
        return (
            np.asarray(obs, np.float32),
            np.asarray(rew, np.float32),
            np.asarray(term, bool),
            np.asarray(trunc, bool),
            np.asarray(final, np.float32),
        )

    def close(self):
        for e in self.envs:
            e.close()


def evaluate_policy_on_gym(
    env_id: str,
    policy_fn,
    n_episodes: int = 5,
    max_steps: int = 1_000,
    seed: int = 0,
    discrete: bool = True,
) -> float:
    """Score a policy (numpy obs batch → actions) on real Gymnasium —
    the cross-implementation validation the reference gets for free by
    training *in* Gymnasium."""
    bridge = GymVecBridge(env_id, n_episodes)
    obs = bridge.reset(seed)
    returns = np.zeros(n_episodes)
    running = np.ones(n_episodes, bool)
    for _ in range(max_steps):
        act = np.asarray(policy_fn(obs))
        if discrete:
            act = act.astype(np.int64)
        obs, rew, term, trunc, _ = bridge.step(act)
        returns += rew * running
        running &= ~(term | trunc)
        if not running.any():
            break
    bridge.close()
    return float(returns.mean())
