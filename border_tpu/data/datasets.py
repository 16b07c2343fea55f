"""Offline datasets → replay buffers.

≙ border-minari: MinariDataset::create_replay_buffer flattens episodes into
transition pushes (border-minari/src/dataset.rs:64-100);
``get_num_transitions`` (:40-55); MinariEvaluator's D4RL-convention
normalized score (border-minari/src/evaluator.rs:26-63).

Sources supported here:
- in-memory episode arrays (``OfflineDataset.from_episodes``),
- ``.npz`` archives (``from_npz`` / ``save_npz``) — the portable exchange
  format replacing the reference's pyo3-loaded minari HDF5,
- optional Minari python package when present (``from_minari``, gated),
- on-policy collection from any agent+env (``collect_dataset``) — used to
  synthesize "pen"-style datasets for the offline algorithms without
  network access.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from border_tpu.core.agent import Agent
from border_tpu.core.env import Environment, VecEnv
from border_tpu.record.record import Record
from border_tpu.replay.buffer import ReplayBuffer, ReplayBufferState, Transition
from border_tpu.train.evaluator import Evaluator


@dataclasses.dataclass
class OfflineDataset:
    """Flat transition arrays (numpy, host-side until ingested)."""

    obs: np.ndarray
    act: np.ndarray
    next_obs: np.ndarray
    reward: np.ndarray
    terminated: np.ndarray
    truncated: np.ndarray

    # -- constructors ------------------------------------------------------
    @classmethod
    def from_episodes(cls, episodes: List[Dict[str, np.ndarray]]) -> "OfflineDataset":
        """Episodes with keys obs [T+1,...], act [T,...], reward [T],
        terminated (bool, final step) — flattened like
        dataset.rs:64-100's per-episode pushes."""
        obs, act, nobs, rew, term, trunc = [], [], [], [], [], []
        for ep in episodes:
            T = len(ep["act"])
            obs.append(ep["obs"][:T])
            nobs.append(ep["obs"][1 : T + 1])
            act.append(ep["act"])
            rew.append(ep["reward"])
            t = np.zeros(T, bool)
            tr = np.zeros(T, bool)
            if ep.get("terminated", False):
                t[-1] = True
            else:
                tr[-1] = True
            term.append(t)
            trunc.append(tr)
        return cls(
            obs=np.concatenate(obs),
            act=np.concatenate(act),
            next_obs=np.concatenate(nobs),
            reward=np.concatenate(rew).astype(np.float32),
            terminated=np.concatenate(term),
            truncated=np.concatenate(trunc),
        )

    @classmethod
    def from_npz(cls, path: str) -> "OfflineDataset":
        """Load a corpus archive.  Dict observations are stored under
        prefixed keys (``obs.<key>`` / ``next_obs.<key>``) and come back as
        dicts — the raw goal-dict form the d4rl-style converters consume
        (≙ the reference's HDF5 dict datasets, border-minari/src/d4rl/**)."""
        d = np.load(path)
        def load_obs(prefix):
            keys = [k for k in d.files if k.startswith(prefix + ".")]
            if keys:
                return {k[len(prefix) + 1:]: d[k] for k in sorted(keys)}
            return d[prefix]

        return cls(
            obs=load_obs("obs"),
            act=d["act"],
            next_obs=load_obs("next_obs"),
            reward=d["reward"],
            terminated=d["terminated"],
            truncated=d["truncated"],
        )

    def save_npz(self, path: str) -> None:
        flat = {}
        for name, val in (("obs", self.obs), ("next_obs", self.next_obs)):
            if isinstance(val, dict):
                for k, v in val.items():
                    flat[f"{name}.{k}"] = v
            else:
                flat[name] = val
        np.savez_compressed(
            path,
            act=self.act,
            reward=self.reward,
            terminated=self.terminated,
            truncated=self.truncated,
            **flat,
        )

    @classmethod
    def from_minari(cls, dataset_id: str) -> "OfflineDataset":
        """Load via the Minari python package when installed
        (≙ MinariDataset::load_dataset, dataset.rs:18-31)."""
        try:
            import minari  # type: ignore
        except ImportError as e:
            raise ImportError(
                "the 'minari' package is not available in this environment; "
                "use OfflineDataset.from_npz or collect_dataset instead"
            ) from e
        ds = minari.load_dataset(dataset_id)
        episodes = []
        for ep in ds.iterate_episodes():
            episodes.append(
                {
                    "obs": np.asarray(ep.observations),
                    "act": np.asarray(ep.actions),
                    "reward": np.asarray(ep.rewards),
                    "terminated": bool(np.asarray(ep.terminations)[-1]),
                }
            )
        return cls.from_episodes(episodes)

    # -- introspection (≙ get_num_transitions, dataset.rs:40-55) -----------
    def __len__(self) -> int:
        return len(self.reward)

    # -- ingestion (≙ create_replay_buffer, dataset.rs:64-100) -------------
    def to_replay_buffer(
        self, buffer: ReplayBuffer, limit: Optional[int] = None
    ) -> ReplayBufferState:
        n = min(len(self), limit or len(self), buffer.capacity)
        batch = Transition(
            obs=jnp.asarray(self.obs[:n]),
            act=jnp.asarray(self.act[:n]),
            next_obs=jnp.asarray(self.next_obs[:n]),
            reward=jnp.asarray(self.reward[:n], jnp.float32),
            terminated=jnp.asarray(self.terminated[:n], bool),
            truncated=jnp.asarray(self.truncated[:n], bool),
        )
        example = jax.tree.map(lambda x: x[0], batch)
        state = buffer.init(example)
        return buffer.push(state, batch)


def collect_dataset(
    env: Environment,
    agent: Agent,
    agent_state: Any,
    n_steps: int,
    num_envs: int = 32,
    seed: int = 0,
    explore: bool = True,
) -> OfflineDataset:
    """Roll out a policy and return its transitions as a dataset — the
    generator for synthetic offline corpora (replaces network-fetched
    D4RL data in this environment)."""
    vec = VecEnv(env, num_envs)
    key = jax.random.PRNGKey(seed)
    vec_state = vec.reset(key)
    steps = n_steps // num_envs

    def body(carry, k):
        vec_state = carry
        if explore:
            action = agent.select_action(agent_state, vec_state.obs, k)
        else:
            action = agent.select_action_eval(agent_state, vec_state.obs, k)
        prev_obs = vec_state.obs
        ts, vec_state = vec.step(vec_state, action)
        out = (prev_obs, action, ts.final_obs, ts.reward, ts.terminated, ts.truncated)
        return vec_state, out

    keys = jax.random.split(key, steps)
    _, (obs, act, nobs, rew, term, trunc) = jax.lax.scan(body, vec_state, keys)

    # tree-map so dict observations (goal-dict envs) flatten per leaf
    flat = lambda t: jax.tree.map(
        lambda x: np.asarray(x).reshape((-1,) + x.shape[2:]), t
    )
    return OfflineDataset(
        obs=flat(obs),
        act=flat(act),
        next_obs=flat(nobs),
        reward=flat(rew),
        terminated=flat(term),
        truncated=flat(trunc),
    )


def normalized_score(score: float, ref_min: float, ref_max: float) -> float:
    """D4RL convention: 100·(score − ref_min)/(ref_max − ref_min)
    (≙ MinariEvaluator, border-minari/src/evaluator.rs:26-63)."""
    return 100.0 * (score - ref_min) / (ref_max - ref_min)


class NormalizedEvaluator(Evaluator):
    """Evaluator that additionally emits the D4RL-normalized score."""

    def __init__(self, *args, ref_min: float, ref_max: float, **kwargs):
        super().__init__(*args, **kwargs)
        self.ref_min = ref_min
        self.ref_max = ref_max

    def evaluate(self, agent, agent_state, eval_index: int = 0) -> Tuple[float, Record]:
        score, record = super().evaluate(agent, agent_state, eval_index)
        record["Normalized score"] = normalized_score(
            score, self.ref_min, self.ref_max
        )
        return score, record
