"""PyVecEnv: train on arbitrary external Python (Gymnasium) environments.

≙ border-py-gym-env's GymEnv (border-py-gym-env/src/base.rs:129-474): the
reference drives Gymnasium through embedded CPython (pyo3) from its actor
threads, one env per actor.  Here N Gymnasium envs run in the host process
behind the SAME host-env interface as the C++ :class:`NativeVecEnv`
(``reset`` / ``step`` / ``step_final`` / spaces / ``close``), so
:class:`border_tpu.train.host.HostEnvTrainer` trains a device agent on real
external envs — the capability VERDICT r2 ranked as the largest remaining
gap (the reference *trains* on Gymnasium, base.rs:268-340; the previous
``gym_bridge`` only evaluated).

Threading: envs are partitioned over a small thread pool (the analogue of
the reference's N actor threads, actor_manager/base.rs:141-175).  Pure-
Python env steps hold the GIL — exactly as the reference's pyo3 calls do
(its Rust actors serialize on CPython's GIL too, base.rs:55-63 note) — so
the pool mainly wins when envs release the GIL (numpy-heavy or native-backed
envs); it never hurts lockstep latency at these env counts.

Auto-reset follows the framework contract (≙ step_with_reset,
border-core/src/base/env.rs:138-160): ``step_final`` returns the post-reset
obs for acting AND the pre-reset final obs for the replay transition.
"""

from __future__ import annotations

import concurrent.futures
from typing import Any, Callable, Optional, Sequence, Tuple

import numpy as np


def _to_space(gym_space):
    """Map a gymnasium space to the framework's space types."""
    import jax.numpy as jnp

    from border_tpu.core import spaces

    name = type(gym_space).__name__
    if name == "Discrete":
        return spaces.Discrete(int(gym_space.n))
    if name == "Box":
        dtype = jnp.uint8 if np.dtype(gym_space.dtype) == np.uint8 else jnp.float32
        return spaces.Box(
            float(np.min(gym_space.low)), float(np.max(gym_space.high)),
            tuple(gym_space.shape), dtype,
        )
    raise NotImplementedError(
        f"unsupported gymnasium space {name}; Dict obs are flattened "
        "built-in (flatten_dict=True) — wrap the env for anything else"
    )


class PyVecEnv:
    """N external Python envs stepped in lockstep with auto-reset.

    ``env_fns``: factories returning Gymnasium-API envs (``reset(seed=)``
    returning ``(obs, info)``; ``step(a)`` returning
    ``(obs, reward, terminated, truncated, info)``).  The convenience form
    ``PyVecEnv.gym(name, num_envs)`` builds them via ``gymnasium.make``.
    """

    def __init__(self, env_fns: Sequence[Callable[[], Any]], seed: int = 0,
                 n_threads: Optional[int] = None, flatten_dict: bool = True,
                 flatten_keys: Optional[Sequence[str]] = None):
        self.envs = [fn() for fn in env_fns]
        self.num_envs = len(self.envs)
        self._seed = seed
        gs = self.envs[0].observation_space
        # built-in Dict-obs flattening (≙ the dict-obs converters the
        # reference ships for robotics envs, border-py-gym-env/src/candle/*
        # and f32_wrapper.py): external robotics-style envs train without a
        # user-written wrapper (VERDICT r3 next #3).
        #
        # ``flatten_keys`` selects WHICH keys, in WHICH order (e.g.
        # ("observation", "desired_goal") to match GoalDictConverter's
        # offline-dataset layout, data/minari.py — required when running a
        # dataset-trained policy on the live env); None uses gymnasium's
        # canonical flatten (ALL keys, alphabetical).
        self._flatten_obs = flatten_dict and type(gs).__name__ == "Dict"
        self._flatten_keys = tuple(flatten_keys) if flatten_keys else None
        if (
            self._flatten_obs
            and self._flatten_keys is None
            and {"observation", "desired_goal", "achieved_goal"}
            <= set(gs.spaces)
        ):
            # goal-env Dict obs (the gymnasium-robotics convention):
            # gymnasium's canonical flatten is ALPHABETICAL and includes
            # achieved_goal — a layout that silently differs from
            # GoalDictConverter's offline-dataset layout
            # (observation ++ desired_goal, data/minari.py).  Default to
            # the converter's layout so a dataset-trained policy sees the
            # SAME ordering on the live env (ADVICE r4); pass
            # flatten_keys explicitly to override.
            self._flatten_keys = ("observation", "desired_goal")
        if self._flatten_obs:
            import gymnasium

            self._gym_obs_space = gs
            if self._flatten_keys is not None:
                missing = [k for k in self._flatten_keys if k not in gs.spaces]
                if missing:
                    raise KeyError(
                        f"flatten_keys {missing} not in the env's Dict obs "
                        f"space (has {sorted(gs.spaces)})"
                    )
                dim = sum(
                    int(np.prod(gs.spaces[k].shape) or 1)
                    for k in self._flatten_keys
                )
                from border_tpu.core import spaces as _sp
                import jax.numpy as _jnp

                self.observation_space = _sp.Box(
                    -np.inf, np.inf, (dim,), _jnp.float32
                )
            else:
                self.observation_space = _to_space(
                    gymnasium.spaces.utils.flatten_space(gs)
                )
        else:
            self.observation_space = _to_space(gs)
        self.action_space = _to_space(self.envs[0].action_space)
        self.obs_shape = self.observation_space.shape
        self.obs_dtype = np.dtype(
            "uint8" if "uint8" in str(self.observation_space.dtype) else
            "float32"
        )
        if n_threads is None:
            import os

            n_threads = min(os.cpu_count() or 1, 8, self.num_envs)
        self._pool = (
            concurrent.futures.ThreadPoolExecutor(n_threads)
            if n_threads > 1 else None
        )
        self._n_threads = max(n_threads, 1)

    @classmethod
    def gym(cls, env_name: str, num_envs: int, seed: int = 0,
            n_threads: Optional[int] = None,
            flatten_keys: Optional[Sequence[str]] = None,
            **make_kwargs) -> "PyVecEnv":
        import gymnasium

        return cls(
            [lambda: gymnasium.make(env_name, **make_kwargs)
             for _ in range(num_envs)],
            seed=seed, n_threads=n_threads, flatten_keys=flatten_keys,
        )

    def _obs(self, o):
        """Per-env obs → flat array (Dict obs flattened in key order)."""
        if self._flatten_obs:
            if self._flatten_keys is not None:
                return np.concatenate(
                    [np.asarray(o[k], np.float32).ravel()
                     for k in self._flatten_keys]
                )
            import gymnasium

            return gymnasium.spaces.utils.flatten(self._gym_obs_space, o)
        return o

    # -- interface shared with NativeVecEnv --------------------------------
    def _map(self, fn):
        if self._pool is None:
            for i in range(self.num_envs):
                fn(i)
            return
        n = self._n_threads
        chunks = [range(w, self.num_envs, n) for w in range(n)]

        def run(ixs):
            for i in ixs:
                fn(i)

        list(self._pool.map(run, chunks))

    def reset(self) -> np.ndarray:
        obs = np.zeros((self.num_envs,) + self.obs_shape, self.obs_dtype)

        def one(i):
            o, _ = self.envs[i].reset(seed=self._seed + i)
            obs[i] = self._obs(o)

        self._map(one)
        return obs.copy()

    def step(self, actions: np.ndarray):
        obs, _, rew, term, trunc = self.step_final(actions)
        return obs, rew, term, trunc

    def step_final(self, actions: np.ndarray) -> Tuple[np.ndarray, ...]:
        """Step + auto-reset, returning (obs, final_obs, reward, terminated,
        truncated) — ``final_obs`` is the pre-reset observation, the correct
        replay ``next_obs`` (≙ Step.init_obs, env.rs:138-160)."""
        actions = np.asarray(actions)
        obs = np.zeros((self.num_envs,) + self.obs_shape, self.obs_dtype)
        final = np.zeros_like(obs)
        rew = np.zeros((self.num_envs,), np.float32)
        term = np.zeros((self.num_envs,), bool)
        trunc = np.zeros((self.num_envs,), bool)

        def one(i):
            o, r, te, tr, _ = self.envs[i].step(actions[i])
            final[i] = self._obs(o)
            rew[i] = r
            term[i] = te
            trunc[i] = tr
            if te or tr:
                o, _ = self.envs[i].reset()
            obs[i] = self._obs(o)

        self._map(one)
        return obs.copy(), final.copy(), rew.copy(), term.copy(), trunc.copy()

    def close(self):
        for e in self.envs:
            try:
                e.close()
            except Exception:
                pass
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None
