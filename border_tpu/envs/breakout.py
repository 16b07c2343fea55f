"""Breakout: on-device ALE-Breakout-equivalent stepper in pure JAX.

Second pixel game (≙ the reference's Atari family via border-atari-env):
4-action minimal set (NOOP FIRE RIGHT LEFT), 6×18 brick wall with
ALE-style row scores (7/7/4/4/1/1 top→bottom), 5 lives with the
episodic-life training semantics supplied by PixelEnv, FIRE-to-serve with
auto-serve fallback.  Same preprocessing contract as Pong
(frame-skip-4 + max-pool + stack-4 + sign clip).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from border_tpu.envs.pixel import FRAME_H, FRAME_W, PixelEnv, PixelGame

ROWS, COLS = 6, 18
BAND_TOP = 0.20
BRICK_H = 0.03
BAND_BOT = BAND_TOP + ROWS * BRICK_H
# top→bottom row scores; tuple (not a jnp array) so importing this
# module never initializes an XLA backend — jax.distributed.initialize
# must run first in multi-process programs (parallel/distributed.py)
ROW_SCORE = (7.0, 7.0, 4.0, 4.0, 1.0, 1.0)

PADDLE_Y = 0.93
PADDLE_HALF = 0.055
PADDLE_SPEED = 0.03
BALL_R = 0.012
BALL_SPEED = 0.017
LIVES = 5
AUTO_SERVE = 45  # frames before auto-FIRE


@struct.dataclass
class BreakoutState:
    bricks: jax.Array  # [ROWS, COLS] bool
    ball_x: jax.Array
    ball_y: jax.Array
    vx: jax.Array
    vy: jax.Array
    paddle_x: jax.Array
    lives: jax.Array
    launched: jax.Array
    idle_frames: jax.Array


class Breakout(PixelGame):
    num_actions = 4
    name = "Breakout-v0"
    max_frames = 27_000

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return BreakoutState(
            bricks=jnp.ones((ROWS, COLS), bool),
            ball_x=jax.random.uniform(k1, (), jnp.float32, 0.3, 0.7),
            ball_y=jnp.float32(PADDLE_Y - 0.05),
            vx=jnp.float32(0.0),
            vy=jnp.float32(0.0),
            paddle_x=jax.random.uniform(k2, (), jnp.float32, 0.3, 0.7),
            lives=jnp.int32(LIVES),
            launched=jnp.bool_(False),
            idle_frames=jnp.int32(0),
        )

    def lives(self, state) -> jax.Array:
        return state.lives

    def frame_step(self, key, state, action):
        a = action.astype(jnp.int32)
        move = jnp.where(a == 2, 1.0, 0.0) + jnp.where(a == 3, -1.0, 0.0)
        paddle_x = jnp.clip(
            state.paddle_x + move * PADDLE_SPEED, PADDLE_HALF, 1.0 - PADDLE_HALF
        )

        # serve: FIRE or auto after AUTO_SERVE idle frames
        fire = (a == 1) | (state.idle_frames >= AUTO_SERVE)
        k_ang = jax.random.fold_in(key, 0)
        ang = jax.random.uniform(k_ang, (), jnp.float32, -0.7, 0.7)
        launch = (~state.launched) & fire
        vx = jnp.where(launch, BALL_SPEED * jnp.sin(ang), state.vx)
        vy = jnp.where(launch, -BALL_SPEED * jnp.cos(ang), state.vy)
        launched = state.launched | launch
        idle_frames = jnp.where(launched, 0, state.idle_frames + 1)

        # ball rides the paddle until launched
        bx = jnp.where(launched, state.ball_x + vx, paddle_x)
        by = jnp.where(launched, state.ball_y + vy, PADDLE_Y - 0.03)

        # wall bounces
        vx = jnp.where((bx < BALL_R) | (bx > 1.0 - BALL_R), -vx, vx)
        bx = jnp.clip(bx, BALL_R, 1.0 - BALL_R)
        vy = jnp.where(by < BALL_R, -vy, vy)
        by = jnp.maximum(by, BALL_R)

        # paddle bounce with offset-angle control
        hit_paddle = (
            launched
            & (vy > 0)
            & (by >= PADDLE_Y - BALL_R)
            & (by <= PADDLE_Y + 0.02)
            & (jnp.abs(bx - paddle_x) <= PADDLE_HALF + BALL_R)
        )
        offset = jnp.clip((bx - paddle_x) / PADDLE_HALF, -1.0, 1.0)
        vx = jnp.where(hit_paddle, BALL_SPEED * offset * 0.9, vx)
        vy = jnp.where(hit_paddle, -jnp.abs(vy), vy)

        # brick collision: cell under the ball, if alive → clear + bounce
        in_band = launched & (by >= BAND_TOP) & (by < BAND_BOT)
        row = jnp.clip(((by - BAND_TOP) / BRICK_H).astype(jnp.int32), 0, ROWS - 1)
        col = jnp.clip((bx * COLS).astype(jnp.int32), 0, COLS - 1)
        brick_alive = state.bricks[row, col] & in_band
        bricks = state.bricks.at[row, col].set(
            jnp.where(brick_alive, False, state.bricks[row, col])
        )
        reward = jnp.where(brick_alive, jnp.asarray(ROW_SCORE)[row], 0.0)
        vy = jnp.where(brick_alive, -vy, vy)

        # life loss
        lost = launched & (by > 1.0 - BALL_R)
        lives = state.lives - lost.astype(jnp.int32)
        launched = launched & ~lost
        bx = jnp.where(lost, paddle_x, bx)
        by = jnp.where(lost, PADDLE_Y - 0.03, by)
        vx = jnp.where(lost, 0.0, vx)
        vy = jnp.where(lost, 0.0, vy)

        cleared = ~bricks.any()
        done = (lives <= 0) | cleared
        new = BreakoutState(
            bricks=bricks,
            ball_x=bx,
            ball_y=by,
            vx=vx,
            vy=vy,
            paddle_x=paddle_x,
            lives=lives,
            launched=launched,
            idle_frames=idle_frames,
        )
        return new, reward.astype(jnp.float32), done

    def render(self, state) -> jax.Array:
        ys = jax.lax.broadcasted_iota(jnp.float32, (FRAME_H, FRAME_W), 0) / (FRAME_H - 1)
        xs = jax.lax.broadcasted_iota(jnp.float32, (FRAME_H, FRAME_W), 1) / (FRAME_W - 1)

        in_band = (ys >= BAND_TOP) & (ys < BAND_BOT)
        row = jnp.clip(((ys - BAND_TOP) / BRICK_H).astype(jnp.int32), 0, ROWS - 1)
        col = jnp.clip((xs * COLS).astype(jnp.int32), 0, COLS - 1)
        bricks_px = state.bricks[row, col] & in_band

        paddle = (jnp.abs(ys - PADDLE_Y) <= 0.012) & (
            jnp.abs(xs - state.paddle_x) <= PADDLE_HALF
        )
        ball = (jnp.abs(xs - state.ball_x) <= BALL_R) & (
            jnp.abs(ys - state.ball_y) <= BALL_R
        )
        frame = (
            jnp.where(bricks_px, 110, 0)
            + jnp.where(paddle, 147, 0)
            + jnp.where(ball, 236, 0)
        )
        return jnp.clip(frame, 0, 255).astype(jnp.uint8)


def make_breakout(train: bool = True) -> PixelEnv:
    return PixelEnv(Breakout(), train=train)
