"""Pong: an on-device ALE-Pong-equivalent stepper in pure JAX.

Replaces border-atari-env's C++ ALE FFI for Pong
(border-atari-env/src/atari_env/ale.rs:62-100) with vectorizable dynamics:
same interface contract as ALE Pong — 6-action minimal set
(≙ get_num_actions_atari, env.rs:97-100), ±1 reward per point, first to 21
ends the episode, grayscale 84×84 frames — but implemented as a pytree game
state stepped one emulator frame at a time under
:class:`border_tpu.envs.pixel.PixelEnv` (which supplies frame-skip-4 with
max-pool, stack-4, and train-mode sign clipping, ≙ env.rs:126-199).

The computer opponent tracks the ball with bounded speed and a reaction
delay, so angled shots beat it — a random policy scores ≈ −21 like real
ALE Pong, a good policy can approach +21.

Start-state variety comes from randomized serves (direction, angle, paddle
start), standing in for ALE's noop-reset scheme (env.rs:263-299).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from border_tpu.envs.pixel import FRAME_H, FRAME_W, PixelEnv, PixelGame

# geometry (normalized field; x: 0=left/opponent, 1=right/agent)
PADDLE_HALF = 0.075
AGENT_X = 0.92
OPP_X = 0.08
PADDLE_W = 0.02
BALL_R = 0.012
BALL_SPEED_X = 0.0175
BALL_VY_MAX = 0.024
PADDLE_SPEED = 0.022
OPP_SPEED = 0.0145
WIN_SCORE = 21
SERVE_FRAMES = 20  # ball invisible between points (like the real game)


@struct.dataclass
class PongState:
    ball_x: jax.Array
    ball_y: jax.Array
    vx: jax.Array
    vy: jax.Array
    agent_y: jax.Array
    opp_y: jax.Array
    score_agent: jax.Array
    score_opp: jax.Array
    serve_timer: jax.Array  # >0: ball held for serve


class Pong(PixelGame):
    num_actions = 6  # NOOP FIRE UP DOWN UPFIRE DOWNFIRE (ALE minimal set)
    name = "Pong-v0"
    max_frames = 27_000

    def _serve(self, key, state: PongState, toward_agent) -> PongState:
        k1, k2 = jax.random.split(key)
        vy = jax.random.uniform(k1, (), jnp.float32, -BALL_VY_MAX, BALL_VY_MAX)
        y = jax.random.uniform(k2, (), jnp.float32, 0.3, 0.7)
        vx = jnp.where(toward_agent, BALL_SPEED_X, -BALL_SPEED_X)
        return state.replace(
            ball_x=jnp.float32(0.5),
            ball_y=y,
            vx=vx,
            vy=vy,
            serve_timer=jnp.int32(SERVE_FRAMES),
        )

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        state = PongState(
            ball_x=jnp.float32(0.5),
            ball_y=jnp.float32(0.5),
            vx=jnp.float32(BALL_SPEED_X),
            vy=jnp.float32(0.0),
            agent_y=jax.random.uniform(k1, (), jnp.float32, 0.35, 0.65),
            opp_y=jnp.float32(0.5),
            score_agent=jnp.int32(0),
            score_opp=jnp.int32(0),
            serve_timer=jnp.int32(0),
        )
        toward_agent = jax.random.bernoulli(k2, 0.5)
        return self._serve(k3, state, toward_agent)

    def frame_step(self, key, state: PongState, action):
        a = action.astype(jnp.int32)
        # UP on actions 2/4, DOWN on 3/5 (ALE RIGHT=up for the right paddle)
        up = (a == 2) | (a == 4)
        down = (a == 3) | (a == 5)
        move = jnp.where(up, -1.0, 0.0) + jnp.where(down, 1.0, 0.0)
        agent_y = jnp.clip(
            state.agent_y + move * PADDLE_SPEED, PADDLE_HALF, 1.0 - PADDLE_HALF
        )

        # opponent: track the ball when it approaches, drift to center otherwise
        approaching = state.vx < 0
        target = jnp.where(approaching, state.ball_y, 0.5)
        delta = target - state.opp_y
        opp_y = state.opp_y + jnp.clip(delta, -OPP_SPEED, OPP_SPEED)
        opp_y = jnp.clip(opp_y, PADDLE_HALF, 1.0 - PADDLE_HALF)

        serving = state.serve_timer > 0

        # ball advance (frozen while serving)
        bx = state.ball_x + jnp.where(serving, 0.0, state.vx)
        by = state.ball_y + jnp.where(serving, 0.0, state.vy)
        # wall bounce
        vy = jnp.where((by < BALL_R) | (by > 1.0 - BALL_R), -state.vy, state.vy)
        by = jnp.clip(by, BALL_R, 1.0 - BALL_R)

        # paddle collisions: reflect + set outgoing angle by hit offset,
        # slight speed-up per exchange (classic Pong feel)
        def hit(paddle_y, crossing, vx_sign):
            offset = (by - paddle_y) / PADDLE_HALF
            contact = crossing & (jnp.abs(by - paddle_y) <= PADDLE_HALF + BALL_R)
            new_vx = vx_sign * jnp.minimum(jnp.abs(state.vx) * 1.03, 0.03)
            new_vy = offset * BALL_VY_MAX
            return contact, new_vx, new_vy

        cross_agent = (state.vx > 0) & (bx >= AGENT_X - PADDLE_W) & ~serving
        c_a, vx_a, vy_a = hit(agent_y, cross_agent, -1.0)
        cross_opp = (state.vx < 0) & (bx <= OPP_X + PADDLE_W) & ~serving
        c_o, vx_o, vy_o = hit(opp_y, cross_opp, 1.0)

        vx = jnp.where(c_a, vx_a, jnp.where(c_o, vx_o, state.vx))
        vy = jnp.where(c_a, vy_a, jnp.where(c_o, vy_o, vy))
        bx = jnp.where(c_a, AGENT_X - PADDLE_W - BALL_R,
                       jnp.where(c_o, OPP_X + PADDLE_W + BALL_R, bx))

        # scoring
        agent_point = (bx < 0.0) & ~serving
        opp_point = (bx > 1.0) & ~serving
        reward = jnp.where(agent_point, 1.0, 0.0) - jnp.where(opp_point, 1.0, 0.0)
        score_agent = state.score_agent + agent_point.astype(jnp.int32)
        score_opp = state.score_opp + opp_point.astype(jnp.int32)

        state2 = PongState(
            ball_x=bx,
            ball_y=by,
            vx=vx,
            vy=vy,
            agent_y=agent_y,
            opp_y=opp_y,
            score_agent=score_agent,
            score_opp=score_opp,
            serve_timer=jnp.maximum(state.serve_timer - 1, 0),
        )
        served = self._serve(key, state2, toward_agent=opp_point)
        point = agent_point | opp_point
        state3 = jax.tree.map(
            lambda s, n: jax.lax.select(point, n, s), state2, served
        )
        done = (score_agent >= WIN_SCORE) | (score_opp >= WIN_SCORE)
        return state3, reward.astype(jnp.float32), done

    def render(self, state: PongState) -> jax.Array:
        ys = jax.lax.broadcasted_iota(jnp.float32, (FRAME_H, FRAME_W), 0) / (FRAME_H - 1)
        xs = jax.lax.broadcasted_iota(jnp.float32, (FRAME_H, FRAME_W), 1) / (FRAME_W - 1)

        def paddle_mask(px, py):
            return (
                (jnp.abs(xs - px) <= PADDLE_W / 2 + 0.006)
                & (jnp.abs(ys - py) <= PADDLE_HALF)
            )

        ball_visible = state.serve_timer <= 0
        ball = (
            (jnp.abs(xs - state.ball_x) <= BALL_R)
            & (jnp.abs(ys - state.ball_y) <= BALL_R)
            & ball_visible
        )
        frame = (
            jnp.where(paddle_mask(AGENT_X, state.agent_y), 147, 0)
            + jnp.where(paddle_mask(OPP_X, state.opp_y), 147, 0)
            + jnp.where(ball, 236, 0)
        )
        return jnp.clip(frame, 0, 255).astype(jnp.uint8)


def make_pong(train: bool = True) -> PixelEnv:
    return PixelEnv(Pong(), train=train)
