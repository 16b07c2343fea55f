"""Real-ALE adapter: the integration seam for `gymnasium[atari]` / ale-py.

The five on-device JAX pixel games reproduce the *learning problems* of
their ALE namesakes, not the exact MDPs (DIVERGENCE.md quantifies the
per-game gap); the reference steps the actual ALE emulator
(border-atari-env/src/atari_env/ale.rs:62-100, ROM loading
env/config.rs:53-60).  ROMs cannot ship in this environment, so this
module provides the SEAM: an adapter exposing the exact
``NativeVecEnv`` surface (``envs/native.py``) over ale-py, so the moment
``pip install gymnasium[atari]`` + ROMs are available, the SAME
``HostEnvTrainer`` + ``FrameReplayBuffer`` pixel path that trains the
C++ envpool games (pong_host/breakout_host gate configs) trains real
Atari — newest-frame uploads, device stack ring, frame-dedup replay and
all.  tests/test_ale_seam.py drives it end to end (skipped when ale-py
is absent).

Preprocessing matches the reference's stack (env.rs:126-199) and the
in-repo PixelEnv contract: frame-skip 4 with 2-frame max-pool, 84×84
grayscale, stack 4 channels-last uint8, sign-clipped rewards + episodic
life in train mode, unclipped full-episode scoring in eval mode —
delegated to ``gymnasium.wrappers.AtariPreprocessing`` (the canonical
DQN-Nature implementation) plus an adapter-side stack ring.
"""

from __future__ import annotations

import concurrent.futures
from typing import Optional, Tuple

import numpy as np


def ale_available() -> bool:
    """True when gymnasium + ale-py (and at least one ROM) import."""
    try:
        import ale_py  # noqa: F401
        import gymnasium  # noqa: F401

        return True
    except ImportError:
        return False


class AleVecEnv:
    """N real-ALE envs in lockstep behind the ``NativeVecEnv`` interface.

    Drop-in for :class:`border_tpu.train.HostEnvTrainer` (frame mode) and
    :class:`border_tpu.train.HostEvaluator` — same
    ``reset/step/step_final/close`` surface and the same
    ``[84, 84, stack]`` uint8 channels-last observation layout as the C++
    envpool (cpp/envpool.cpp) and the on-device PixelEnv.
    """

    def __init__(self, env_name: str, num_envs: int, seed: int = 0,
                 n_threads: Optional[int] = None, train: bool = True,
                 stack: int = 4):
        import gymnasium
        from gymnasium.wrappers import AtariPreprocessing

        self.name = env_name
        self.num_envs = num_envs
        self.stack = stack
        self.train = train
        self.envs = []
        for i in range(num_envs):
            # frameskip=1 at the base env: AtariPreprocessing applies the
            # canonical skip-4 + 2-frame max-pool itself (≙ env.rs:126-152)
            e = gymnasium.make(env_name, frameskip=1)
            e = AtariPreprocessing(
                e, noop_max=30, frame_skip=4, screen_size=84,
                terminal_on_life_loss=train,  # ≙ episodic-life train mode
                grayscale_obs=True, scale_obs=False,
            )
            e.reset(seed=seed + i)
            self.envs.append(e)
        self._stacks = np.zeros((num_envs, 84, 84, stack), np.uint8)
        self.obs_shape = (84, 84, stack)
        self.obs_dtype = np.uint8
        self.num_actions = int(self.envs[0].action_space.n)
        if n_threads is None:
            import os

            n_threads = min(os.cpu_count() or 1, 8, num_envs)
        self._pool = (
            concurrent.futures.ThreadPoolExecutor(n_threads)
            if n_threads > 1 else None
        )

    @property
    def observation_space(self):
        import jax.numpy as jnp

        from border_tpu.core import spaces

        return spaces.Box(0, 255, self.obs_shape, jnp.uint8)

    @property
    def action_space(self):
        from border_tpu.core import spaces

        return spaces.Discrete(self.num_actions)

    def _map(self, fn):
        if self._pool is None:
            for i in range(self.num_envs):
                fn(i)
        else:
            list(self._pool.map(fn, range(self.num_envs)))

    def reset(self) -> np.ndarray:
        def one(i):
            frame, _ = self.envs[i].reset()
            # a fresh episode repeats its first frame through the stack
            # (≙ the ring init of env.rs:189-199 / PixelEnv.reset_env)
            self._stacks[i] = frame[..., None]

        self._map(one)
        return self._stacks.copy()

    def step(self, actions: np.ndarray):
        obs, _, rew, term, trunc = self.step_final(actions)
        return obs, rew, term, trunc

    def step_final(self, actions: np.ndarray
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                              np.ndarray, np.ndarray]:
        """(obs, final_obs, reward, terminated, truncated): ``final_obs``
        is the pre-auto-reset stack — the correct replay ``next_obs`` at
        episode boundaries (≙ Step.init_obs, border-core env.rs:138-160)."""
        actions = np.asarray(actions)
        final = np.empty_like(self._stacks)
        rew = np.zeros((self.num_envs,), np.float32)
        term = np.zeros((self.num_envs,), bool)
        trunc = np.zeros((self.num_envs,), bool)

        def one(i):
            frame, r, te, tr, _ = self.envs[i].step(int(actions[i]))
            self._stacks[i] = np.concatenate(
                [self._stacks[i, ..., 1:], frame[..., None]], axis=-1
            )
            final[i] = self._stacks[i]
            rew[i] = np.sign(r) if self.train else r  # ≙ sign clip (train)
            term[i], trunc[i] = te, tr
            if te or tr:
                f0, _ = self.envs[i].reset()
                self._stacks[i] = f0[..., None]

        self._map(one)
        return self._stacks.copy(), final, rew.copy(), term, trunc

    def close(self):
        for e in self.envs:
            try:
                e.close()
            except Exception:
                pass
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None
