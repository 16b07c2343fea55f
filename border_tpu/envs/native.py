"""Native (C++) vectorized host environments + async device feeding.

≙ the reference's native env layer: ALE C++ behind FFI
(border-atari-env/src/atari_env/ale.rs:62-100) and the actor thread pool
(border-async-trainer ActorManager).  Here:

- :class:`NativeVecEnv` — ctypes binding to ``cpp/libenvpool.so``: N env
  instances stepped by a C++ worker-thread pool, results written directly
  into numpy buffers (no per-step allocation).
- :class:`AsyncEnvFeeder` — double-buffered host→device pipeline: a
  background thread steps the native envs with the *previous* policy's
  actions while the device computes, so host env time hides behind device
  time (SURVEY.md §2.1's "host-side C++ vectorized ALE feeding the device
  via double-buffered transfers").

Pure-JAX envs don't use this path — they run inside the jitted program.
"""

from __future__ import annotations

import ctypes
import os
import queue
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "cpp")
_LIB_PATH = os.path.join(_CPP_DIR, "libenvpool.so")

# (name, train) → C++ env id.  Pong is the 84×84 uint8 pixel game (the
# C++ twin of envs/pong.py with the DQN preprocessing stack inline); its
# train/eval variants flip reward sign-clipping (≙ env/config.rs:1-94).
ENV_IDS = {
    ("CartPole-v1", True): 0, ("CartPole-v1", False): 0,
    ("Pendulum-v1", True): 1, ("Pendulum-v1", False): 1,
    ("Pong-v0", True): 2, ("Pong-v0", False): 3,
    ("Breakout-v0", True): 4, ("Breakout-v0", False): 5,
}


def _load_lib() -> ctypes.CDLL:
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _CPP_DIR], check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.envpool_create.restype = ctypes.c_void_p
    lib.envpool_create.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
    ]
    lib.envpool_obs_dim.restype = ctypes.c_int
    lib.envpool_obs_dim.argtypes = [ctypes.c_void_p]
    lib.envpool_obs_dtype.restype = ctypes.c_int
    lib.envpool_obs_dtype.argtypes = [ctypes.c_void_p]
    lib.envpool_num_actions.restype = ctypes.c_int
    lib.envpool_num_actions.argtypes = [ctypes.c_void_p]
    lib.envpool_reset.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.envpool_step.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 5
    lib.envpool_step2.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 6
    lib.envpool_destroy.argtypes = [ctypes.c_void_p]
    return lib


_lib: Optional[ctypes.CDLL] = None


def native_available() -> bool:
    global _lib
    if _lib is not None:
        return True
    try:
        _lib = _load_lib()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


class NativeVecEnv:
    """N C++ envs stepped in lockstep with auto-reset (host side)."""

    def __init__(self, env_name: str, num_envs: int, seed: int = 0,
                 n_threads: Optional[int] = None, train: bool = True):
        if not native_available():
            raise RuntimeError("cpp/libenvpool.so could not be built/loaded")
        if (env_name, train) not in ENV_IDS:
            names = sorted({k[0] for k in ENV_IDS})
            raise KeyError(f"native env {env_name!r} not in {names}")
        if n_threads is None:
            n_threads = min(os.cpu_count() or 1, 8)
        self._h = _lib.envpool_create(
            ENV_IDS[(env_name, train)], num_envs, seed, n_threads
        )
        if not self._h:
            raise RuntimeError("envpool_create failed")
        self.num_envs = num_envs
        self.obs_dim = _lib.envpool_obs_dim(self._h)
        self.num_actions = _lib.envpool_num_actions(self._h)
        # uint8 envs are 84×84 stack-4 pixel frames, channels-last (the
        # PixelEnv observation layout); f32 envs are flat feature vectors
        if _lib.envpool_obs_dtype(self._h) == 1:
            self.obs_shape = (84, 84, 4)
            self.obs_dtype = np.uint8
            assert self.obs_dim == 84 * 84 * 4
        else:
            self.obs_shape = (self.obs_dim,)
            self.obs_dtype = np.float32
        shape = (num_envs,) + self.obs_shape
        self._obs = np.zeros(shape, self.obs_dtype)
        self._final_obs = np.zeros(shape, self.obs_dtype)
        self._rew = np.zeros((num_envs,), np.float32)
        self._term = np.zeros((num_envs,), np.uint8)
        self._trunc = np.zeros((num_envs,), np.uint8)

    @property
    def observation_space(self):
        from border_tpu.core import spaces
        import jax.numpy as jnp

        if self.obs_dtype == np.uint8:
            return spaces.Box(0, 255, self.obs_shape, jnp.uint8)
        return spaces.Box(-np.inf, np.inf, self.obs_shape, jnp.float32)

    @property
    def action_space(self):
        from border_tpu.core import spaces

        return spaces.Discrete(self.num_actions)

    def reset(self) -> np.ndarray:
        _lib.envpool_reset(self._h, self._obs.ctypes.data)
        return self._obs.copy()

    def step(self, actions: np.ndarray
             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        actions = np.ascontiguousarray(actions, np.int32)
        _lib.envpool_step(
            self._h,
            actions.ctypes.data,
            self._obs.ctypes.data,
            self._rew.ctypes.data,
            self._term.ctypes.data,
            self._trunc.ctypes.data,
        )
        return (
            self._obs.copy(),
            self._rew.copy(),
            self._term.astype(bool),
            self._trunc.astype(bool),
        )

    def step_final(self, actions: np.ndarray):
        """Step returning (obs, final_obs, reward, terminated, truncated):
        ``final_obs`` is the pre-auto-reset observation — the correct
        ``next_obs`` for replay transitions at episode boundaries
        (≙ Step.init_obs handling, border-core/src/base/env.rs:138-160)."""
        actions = np.ascontiguousarray(actions, np.int32)
        _lib.envpool_step2(
            self._h,
            actions.ctypes.data,
            self._obs.ctypes.data,
            self._final_obs.ctypes.data,
            self._rew.ctypes.data,
            self._term.ctypes.data,
            self._trunc.ctypes.data,
        )
        return (
            self._obs.copy(),
            self._final_obs.copy(),
            self._rew.copy(),
            self._term.astype(bool),
            self._trunc.astype(bool),
        )

    def close(self):
        if self._h:
            _lib.envpool_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class AsyncEnvFeeder:
    """Double-buffered host env stepping overlapped with device compute.

    Protocol: ``submit(actions)`` hands the next actions to the worker and
    returns immediately; ``collect()`` blocks for the previous step's
    results.  With one step of pipelining the host env time overlaps the
    device's forward/update time.
    """

    def __init__(self, env: NativeVecEnv, step_fn=None):
        self.env = env
        self._step = step_fn if step_fn is not None else env.step
        self._in: "queue.Queue" = queue.Queue(maxsize=2)
        self._out: "queue.Queue" = queue.Queue(maxsize=2)
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def _loop(self):
        while True:
            actions = self._in.get()
            if actions is None:
                return
            self._out.put(self._step(actions))

    def submit(self, actions: np.ndarray) -> None:
        self._in.put(np.asarray(actions))

    def collect(self):
        return self._out.get()

    def close(self):
        self._in.put(None)
        self._worker.join(timeout=5)
        self.env.close()
