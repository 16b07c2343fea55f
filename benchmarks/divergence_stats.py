"""Measured behavior statistics for the five on-device games.

Feeds DIVERGENCE.md: per game, a random policy and a game-relevant naive
policy are rolled out in EVAL mode (raw scores, no reward clip) and the
per-episode return / length distributions are recorded — the measured
side of the game-vs-ALE divergence table (published ALE numbers from the
DQN Nature table are cited in DIVERGENCE.md).  Runs on CPU.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np

from border_tpu.core.env import VecEnv
from border_tpu.envs import make

GAMES = {
    # game: (naive policy name, action fn)
    "Pong-v0": ("always-UP", lambda k, n, A: jnp.full((n,), 2, jnp.int32)),
    "Breakout-v0": ("always-FIRE+random", None),
    "Seaquest-v0": ("random", None),
    "Freeway-v0": ("always-UP", lambda k, n, A: jnp.full((n,), 1, jnp.int32)),
    "SpaceInvaders-v0": ("always-FIRE",
                         lambda k, n, A: jnp.full((n,), 1, jnp.int32)),
}

N = 8
STEPS = 3_000


def rollout(name, policy, steps=STEPS):
    env = make(name, train=False)  # eval mode: raw scores, no clip
    vec = VecEnv(env, N)
    state = vec.reset(jax.random.PRNGKey(0))
    A = vec.action_space.n

    def body(carry, k):
        st = carry
        if policy is None:
            act = jax.random.randint(k, (N,), 0, A)
        else:
            act = policy(k, N, A)
        ts, st = vec.step(st, act)
        return st, (ts.done, st.last_return, st.last_length)

    @jax.jit
    def roll(state, key):
        keys = jax.random.split(key, steps)
        return jax.lax.scan(body, state, keys)

    state, (done, last_ret, last_len) = roll(state, jax.random.PRNGKey(1))
    done = np.asarray(done)
    # at a done step, last_return/last_length hold the finished episode's
    # return and length (frozen at the boundary, core/env.py)
    rets = np.asarray(last_ret)[done]
    lens_steps = np.asarray(last_len)[done].tolist()
    return {
        "episodes": int(done.sum()),
        "return_mean": round(float(rets.mean()), 1) if rets.size else None,
        "return_min": round(float(rets.min()), 1) if rets.size else None,
        "return_max": round(float(rets.max()), 1) if rets.size else None,
        "ep_len_env_steps_mean": round(float(np.mean(lens_steps)), 1)
        if lens_steps else None,
        "ep_len_ale_frames_mean": round(4 * float(np.mean(lens_steps)), 1)
        if lens_steps else None,
    }


def main():
    out = {}
    for name, (naive_name, naive) in GAMES.items():
        r = rollout(name, None)
        out[name] = {"random": r}
        if naive is not None:
            out[name][naive_name] = rollout(name, naive)
        print(name, json.dumps(out[name]), flush=True)
    path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "divergence_stats.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
