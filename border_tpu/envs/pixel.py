"""Pixel-environment machinery: DQN-paper preprocessing, on device.

≙ border-atari-env's SB3-AtariWrapper-equivalent stack
(border-atari-env/src/env.rs:43-346):

- 4-frame action repeat with max-pool of the last two raw frames
  (env.rs:126-152),
- grayscale + 84×84 resize (env.rs:166-187) — envs here render grayscale
  84×84 directly when they can; :func:`to_gray_84` covers RGB/other sizes,
- 4-frame stacking ring (env.rs:189-199) — kept in the env state pytree,
  channels-last [84, 84, 4] (TPU layout; the reference's [1,4,1,84,84]
  torch NCHW layout is not copied),
- sign reward clipping in train mode (env.rs:154-164),
- train/eval flag flips clipping (env/config.rs:1-94).

Everything is static-shape jittable; the "emulator" is whatever pure-JAX
game implements :class:`PixelGame`.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from border_tpu.core import spaces
from border_tpu.core.env import Environment

FRAME_H = FRAME_W = 84


def to_gray_84(rgb: jax.Array) -> jax.Array:
    """RGB [H, W, 3] uint8 → grayscale 84×84 uint8 (luma weights as in
    env.rs:166-187)."""
    gray = (
        0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    )
    gray = jax.image.resize(gray, (FRAME_H, FRAME_W), method="bilinear")
    return jnp.clip(gray, 0, 255).astype(jnp.uint8)


class PixelGame:
    """Single-frame game dynamics contract consumed by PixelEnv.

    - ``init(key) -> game_state``
    - ``frame_step(key, game_state, action) -> (game_state, reward, done)``
      advances ONE emulator frame,
    - ``render(game_state) -> [84, 84] uint8`` grayscale frame,
    - ``num_actions``, ``name``, ``max_frames``.
    """

    num_actions: int = 6
    name: str = "PixelGame"
    max_frames: int = 27_000  # ≙ ALE frame cap per episode

    def init(self, key: jax.Array):
        raise NotImplementedError

    def frame_step(self, key, state, action):
        raise NotImplementedError

    def render(self, state) -> jax.Array:
        raise NotImplementedError

    def lives(self, state) -> jax.Array:
        """Remaining lives (games without lives return 1).  Drives the
        episodic-life wrapper semantics (≙ env.rs:263-299)."""
        return jnp.int32(1)


@struct.dataclass
class PixelEnvState:
    game: Any
    frames: jax.Array  # [84, 84, 4] uint8 stack ring (newest last)
    frame_count: jax.Array
    t: jax.Array  # env steps (post frame-skip)
    lives: jax.Array  # lives at the previous step (episodic-life tracking)
    game_over: jax.Array  # the game's own terminal flag (not life loss)


@struct.dataclass
class PixelEnvParams:
    frame_skip: int = struct.field(pytree_node=False, default=4)
    clip_reward: bool = struct.field(pytree_node=False, default=True)
    episodic_life: bool = struct.field(pytree_node=False, default=True)
    max_frames: int = struct.field(pytree_node=False, default=27_000)


class PixelEnv(Environment):
    """Environment adapter: PixelGame → stacked-frame pixel MDP."""

    def __init__(self, game: PixelGame, train: bool = True):
        self.game = game
        self.train = train
        self.name = game.name

    @property
    def default_params(self) -> PixelEnvParams:
        # train mode: sign clip + episodic life (≙ env/config.rs:1-94 flip)
        return PixelEnvParams(
            clip_reward=self.train,
            episodic_life=self.train,
            max_frames=self.game.max_frames,
        )

    def observation_space(self, params) -> spaces.Box:
        return spaces.Box(0, 255, (FRAME_H, FRAME_W, 4), jnp.uint8)

    def action_space(self, params) -> spaces.Discrete:
        return spaces.Discrete(self.game.num_actions)

    def reset_env(self, key, params):
        game = self.game.init(key)
        frame = self.game.render(game)
        frames = jnp.repeat(frame[:, :, None], 4, axis=2)
        state = PixelEnvState(
            game=game,
            frames=frames,
            frame_count=jnp.int32(0),
            t=jnp.int32(0),
            lives=self.game.lives(game),
            game_over=jnp.bool_(False),
        )
        return frames, state

    def step_env(self, key, state, action, params):
        keys = jax.random.split(key, params.frame_skip)

        # unrolled frame-skip: only the LAST TWO substeps are rendered —
        # the max-pool consumes nothing else (≙ ALE, which grabs the screen
        # only on the frames it pools, env.rs:126-152); skipping the first
        # frame_skip−2 renders roughly halves the env engine's frame cost
        game = state.game
        reward = jnp.float32(0.0)
        done = jnp.bool_(False)
        rendered = []
        for i in range(params.frame_skip):
            game2, r, d = self.game.frame_step(keys[i], game, action)
            # freeze dynamics once the point/episode ended mid-skip
            game = jax.tree.map(
                lambda a, b: jax.lax.select(done, a, b), game, game2
            )
            reward = reward + jnp.where(done, 0.0, r)
            done = jnp.logical_or(done, d)
            if i >= params.frame_skip - 2:
                rendered.append(self.game.render(game))
        # max-pool of the last two raw frames (env.rs:126-152)
        frame = (
            rendered[-1] if len(rendered) == 1
            else jnp.maximum(rendered[-1], rendered[-2])
        )
        frames = jnp.concatenate(
            [state.frames[:, :, 1:], frame[:, :, None]], axis=2
        )
        frame_count = state.frame_count + params.frame_skip
        t = state.t + 1
        new_lives = self.game.lives(game)
        life_lost = new_lives < state.lives
        new_state = PixelEnvState(
            game=game,
            frames=frames,
            frame_count=frame_count,
            t=t,
            lives=new_lives,
            game_over=done,
        )
        if params.clip_reward:
            reward = jnp.sign(reward)  # sign clip in train (env.rs:154-164)
        terminated = done
        if params.episodic_life:
            # life loss ends the learning episode (env.rs:263-299)
            terminated = jnp.logical_or(done, life_lost)
        truncated = (frame_count >= params.max_frames) & ~terminated
        return frames, new_state, reward.astype(jnp.float32), terminated, truncated, {}

    def post_done_state(self, key, state, obs, params):
        """Full reset only when the game is really over (or time-capped);
        after a mere life loss the game continues in place."""
        obs_re, st_re = self.reset_env(key, params)
        really_over = jnp.logical_or(
            state.game_over, state.frame_count >= params.max_frames
        )
        st = jax.tree.map(
            lambda a, b: jax.lax.select(really_over, a, b), st_re, state
        )
        new_obs = jnp.where(really_over, obs_re, obs)
        return new_obs, st
