"""Space Invaders: on-device ALE-SpaceInvaders-equivalent stepper in pure JAX.

Fifth pixel game (≙ the reference's Atari family via border-atari-env,
border-atari-env/src/env.rs:43-346 preprocessing contract).  ALE-style
mechanics on the minimal 6-action set (NOOP FIRE RIGHT LEFT RIGHTFIRE
LEFTFIRE, ≙ get_num_actions_atari, env.rs:97-100):

- a 6×6 alien grid marches horizontally, drops a row and reverses at the
  screen edge, and accelerates as aliens die (speed ∝ 1/remaining),
- one player shot at a time (the 1978 cabinet rule ALE inherits), alien
  bombs from the lowest living alien of random columns,
- three erodible shields between the cannon and the grid,
- ALE scoring: an alien in row r (top→bottom) is worth 30/25/20/15/10/5
  — wave total 630, waves respawn with a one-row-lower start,
- a mystery saucer crosses the top of the screen periodically and is
  worth 100 when shot (ALE's value cycles 50-300 with the player's shot
  count; the fixed 100 is the documented simplification),
- 3 lives; the game also ends if the grid reaches the cannon row.

All dynamics are static-shape jittable; remaining divergence from real
ALE (simplified bomb cadence, fixed saucer value) is inherent to the
no-ROM constraint and quantified in DIVERGENCE.md.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from border_tpu.envs.pixel import FRAME_H, FRAME_W, PixelEnv, PixelGame

ROWS, COLS = 6, 6
# top→bottom ALE row scores
ROW_SCORE = (30.0, 25.0, 20.0, 15.0, 10.0, 5.0)

# normalized [0,1] playfield geometry
GRID_W = 0.58            # width of the alien grid block
CELL_W = GRID_W / COLS
CELL_H = 0.055
ALIEN_HALF_W = 0.032
ALIEN_HALF_H = 0.018
GRID_TOP0 = 0.08         # initial y of the top row
DROP = 0.04              # descent per edge hit
MARCH_BASE = 0.0012      # grid speed with a full wave (per frame)
MARCH_MAX = 0.009        # grid speed with one alien left

CANNON_Y = 0.92
CANNON_HALF = 0.035
CANNON_SPEED = 0.012

SHOT_SPEED = 0.035       # player shot (fast, one at a time)
BOMB_SPEED = 0.011       # alien bombs
N_BOMBS = 3
BOMB_PERIOD = 35         # frames between bomb drops (per slot, staggered)

N_SHIELDS = 3
SHIELD_Y = 0.80
SHIELD_CELLS = 4         # health cells per shield
SHIELD_HALF = 0.045
SHIELD_HP = 4            # hits a cell absorbs

LIVES = 3
RESPAWN_FRAMES = 30      # cannon invulnerable/frozen after a hit

SAUCER_Y = 0.045         # mystery ship track (above the grid)
SAUCER_SPEED = 0.004
SAUCER_PERIOD = 600      # frames between saucer passes
SAUCER_HALF_W = 0.03
SAUCER_SCORE = 100.0     # ALE cycles 50-300 by shot count; fixed here


@struct.dataclass
class SpaceInvadersState:
    aliens: jax.Array      # [ROWS, COLS] bool
    grid_x: jax.Array      # left edge of the grid block
    grid_y: jax.Array      # top edge of the grid block
    grid_dir: jax.Array    # +1 | -1 march direction
    cannon_x: jax.Array
    shot_x: jax.Array
    shot_y: jax.Array
    shot_live: jax.Array
    bomb_x: jax.Array      # [N_BOMBS]
    bomb_y: jax.Array      # [N_BOMBS]
    bomb_live: jax.Array   # [N_BOMBS] bool
    shields: jax.Array     # [N_SHIELDS, SHIELD_CELLS] int32 hp
    saucer_x: jax.Array
    saucer_live: jax.Array
    lives: jax.Array
    respawn: jax.Array     # frames of post-hit freeze left
    frame: jax.Array       # frame counter (bomb cadence)
    wave: jax.Array        # completed waves (start row lowers)


def _alien_centers(state):
    """[ROWS, COLS] x/y centers of every grid cell."""
    cx = (
        state.grid_x
        + (jnp.arange(COLS, dtype=jnp.float32) + 0.5) * CELL_W
    )[None, :]
    cy = (
        state.grid_y
        + (jnp.arange(ROWS, dtype=jnp.float32) + 0.5) * CELL_H
    )[:, None]
    return jnp.broadcast_to(cx, (ROWS, COLS)), jnp.broadcast_to(cy, (ROWS, COLS))


class SpaceInvaders(PixelGame):
    num_actions = 6
    name = "SpaceInvaders-v0"
    max_frames = 27_000

    def init(self, key):
        k1 = jax.random.fold_in(key, 0)
        return SpaceInvadersState(
            aliens=jnp.ones((ROWS, COLS), bool),
            grid_x=jax.random.uniform(k1, (), jnp.float32, 0.05, 0.25),
            grid_y=jnp.float32(GRID_TOP0),
            grid_dir=jnp.float32(1.0),
            cannon_x=jnp.float32(0.5),
            shot_x=jnp.float32(0.0),
            shot_y=jnp.float32(0.0),
            shot_live=jnp.bool_(False),
            bomb_x=jnp.zeros((N_BOMBS,), jnp.float32),
            bomb_y=jnp.zeros((N_BOMBS,), jnp.float32),
            bomb_live=jnp.zeros((N_BOMBS,), bool),
            shields=jnp.full((N_SHIELDS, SHIELD_CELLS), SHIELD_HP, jnp.int32),
            saucer_x=jnp.float32(0.0),
            saucer_live=jnp.bool_(False),
            lives=jnp.int32(LIVES),
            respawn=jnp.int32(0),
            frame=jnp.int32(0),
            wave=jnp.int32(0),
        )

    def lives(self, state) -> jax.Array:
        return state.lives

    # -- dynamics ----------------------------------------------------------
    def frame_step(self, key, state, action):
        a = action.astype(jnp.int32)
        frozen = state.respawn > 0

        # cannon motion (RIGHT/RIGHTFIRE → +, LEFT/LEFTFIRE → −)
        move = (
            jnp.where((a == 2) | (a == 4), 1.0, 0.0)
            + jnp.where((a == 3) | (a == 5), -1.0, 0.0)
        )
        cannon_x = jnp.clip(
            state.cannon_x + jnp.where(frozen, 0.0, move) * CANNON_SPEED,
            CANNON_HALF, 1.0 - CANNON_HALF,
        )

        # player shot: FIRE-class action launches if no shot in flight
        fire = ((a == 1) | (a == 4) | (a == 5)) & ~state.shot_live & ~frozen
        shot_x = jnp.where(fire, cannon_x, state.shot_x)
        shot_y = jnp.where(fire, CANNON_Y - 0.03, state.shot_y - SHOT_SPEED)
        shot_live = (state.shot_live | fire) & (shot_y > 0.0)

        # grid march: speed scales with 1/remaining (classic accel)
        n_alive = state.aliens.sum().astype(jnp.float32)
        speed = MARCH_BASE + (MARCH_MAX - MARCH_BASE) * (
            1.0 - (n_alive - 1.0) / (ROWS * COLS - 1.0)
        )
        gx = state.grid_x + state.grid_dir * speed
        # live-column extent: edge bounce uses the outermost LIVING columns
        col_alive = state.aliens.any(axis=0)  # [COLS]
        colf = jnp.arange(COLS, dtype=jnp.float32)
        left_pad = jnp.min(jnp.where(col_alive, colf, float(COLS))) * CELL_W
        right_ext = (jnp.max(jnp.where(col_alive, colf, -1.0)) + 1.0) * CELL_W
        hit_edge = ((gx + left_pad < 0.01) & (state.grid_dir < 0)) | (
            (gx + right_ext > 0.99) & (state.grid_dir > 0)
        )
        grid_dir = jnp.where(hit_edge, -state.grid_dir, state.grid_dir)
        grid_x = jnp.where(hit_edge, state.grid_x, gx)
        grid_y = state.grid_y + jnp.where(hit_edge, DROP, 0.0)

        tmp = state.replace(grid_x=grid_x, grid_y=grid_y)
        ax, ay = _alien_centers(tmp)

        # shot↔alien collision: lowest living alien in the shot's column
        in_x = jnp.abs(ax - shot_x) <= ALIEN_HALF_W
        in_y = jnp.abs(ay - shot_y) <= ALIEN_HALF_H + 0.012
        hit_mask = state.aliens & in_x & in_y & shot_live
        any_hit = hit_mask.any()
        # kill exactly one alien: the BOTTOM-most in-band candidate — an
        # upward shot meets the lowest alien first (when the ±0.03 hit band
        # spans two grid rows, row-major argmax used to kill the top one,
        # inflating scores: top rows are worth 30 vs 5)
        hit_flat = hit_mask.ravel()
        first = ROWS * COLS - 1 - jnp.argmax(hit_flat[::-1])
        kill = hit_flat & (jnp.arange(ROWS * COLS) == first)
        aliens = (state.aliens.ravel() & ~kill).reshape(ROWS, COLS)
        row_of_kill = first // COLS
        reward = jnp.where(
            any_hit, jnp.asarray(ROW_SCORE)[row_of_kill], 0.0
        )
        shot_live = shot_live & ~any_hit

        # mystery saucer: spawns every SAUCER_PERIOD frames at the left
        # edge, crosses the top track, dies at the right edge or to a
        # player shot (worth SAUCER_SCORE)
        frame_next = state.frame + 1
        spawn_saucer = ((frame_next % SAUCER_PERIOD) == 0) & ~state.saucer_live
        saucer_x = jnp.where(spawn_saucer, 0.02,
                             state.saucer_x + SAUCER_SPEED)
        saucer_live = (state.saucer_live | spawn_saucer) & (saucer_x < 0.98)
        saucer_hit = (
            saucer_live
            & shot_live
            & (jnp.abs(saucer_x - shot_x) <= SAUCER_HALF_W)
            & (shot_y <= SAUCER_Y + 0.02)
        )
        reward = reward + jnp.where(saucer_hit, SAUCER_SCORE, 0.0)
        saucer_live = saucer_live & ~saucer_hit
        shot_live = shot_live & ~saucer_hit

        # shot↔shield erosion: select the shield by NEAREST center (the
        # bomb path below already does) — the old truncating index mapped
        # shots over the left half of shields 1/2 to the wrong shield,
        # letting them pass through without blocking or eroding
        shield_centers = 0.2 + 0.3 * jnp.arange(N_SHIELDS, dtype=jnp.float32)
        s_idx = jnp.argmin(jnp.abs(shot_x - shield_centers))
        cell = jnp.clip(
            (
                (shot_x - (shield_centers[s_idx] - SHIELD_HALF))
                / (2 * SHIELD_HALF / SHIELD_CELLS)
            ).astype(jnp.int32),
            0, SHIELD_CELLS - 1,
        )
        over_shield = jnp.abs(shot_x - shield_centers[s_idx]) <= SHIELD_HALF
        shot_on_shield = (
            shot_live
            & over_shield
            & (jnp.abs(shot_y - SHIELD_Y) <= 0.015)
            & (state.shields[s_idx, cell] > 0)
        )
        shields = state.shields.at[s_idx, cell].add(
            jnp.where(shot_on_shield, -1, 0)
        )
        shot_live = shot_live & ~shot_on_shield

        # alien bombs: slot i drops every BOMB_PERIOD frames (staggered) from
        # the lowest living alien of a random column
        frame = frame_next
        k_cols = jax.random.split(key, N_BOMBS)
        rows_rev = ROWS - 1 - jnp.arange(ROWS)[:, None]  # prefer low rows
        bomb_x, bomb_y, bomb_live = [], [], []
        for i in range(N_BOMBS):
            due = (frame % BOMB_PERIOD) == (i * (BOMB_PERIOD // N_BOMBS))
            col = jax.random.randint(k_cols[i], (), 0, COLS)
            col_has = aliens[:, col].any()
            # lowest living row in that column
            low_row = ROWS - 1 - jnp.argmax(aliens[::-1, col])
            spawn = due & col_has & ~state.bomb_live[i]
            bx = jnp.where(spawn, ax[low_row, col], state.bomb_x[i])
            by = jnp.where(
                spawn, ay[low_row, col] + CELL_H, state.bomb_y[i] + BOMB_SPEED
            )
            live = (state.bomb_live[i] | spawn) & (by < 1.0)
            bomb_x.append(bx)
            bomb_y.append(by)
            bomb_live.append(live)
        bomb_x = jnp.stack(bomb_x)
        bomb_y = jnp.stack(bomb_y)
        bomb_live = jnp.stack(bomb_live)
        del rows_rev

        # bomb↔shield erosion
        b_idx = jnp.clip(
            jnp.argmin(jnp.abs(bomb_x[:, None] - shield_centers[None, :]), 1),
            0, N_SHIELDS - 1,
        )
        b_cell = jnp.clip(
            (
                (bomb_x - (shield_centers[b_idx] - SHIELD_HALF))
                / (2 * SHIELD_HALF / SHIELD_CELLS)
            ).astype(jnp.int32),
            0, SHIELD_CELLS - 1,
        )
        b_over = jnp.abs(bomb_x - shield_centers[b_idx]) <= SHIELD_HALF
        b_on_shield = (
            bomb_live
            & b_over
            & (jnp.abs(bomb_y - SHIELD_Y) <= 0.015)
            & (shields[b_idx, b_cell] > 0)
        )
        shields = shields.at[b_idx, b_cell].add(
            jnp.where(b_on_shield, -1, 0)
        )
        bomb_live = bomb_live & ~b_on_shield

        # bomb↔cannon hit
        cannon_hit = (
            bomb_live
            & (jnp.abs(bomb_x - cannon_x) <= CANNON_HALF + 0.008)
            & (bomb_y >= CANNON_Y - 0.02)
            & ~frozen
        ).any()
        bomb_live = bomb_live & ~(
            (jnp.abs(bomb_x - cannon_x) <= CANNON_HALF + 0.008)
            & (bomb_y >= CANNON_Y - 0.02)
        )
        lives = state.lives - cannon_hit.astype(jnp.int32)
        respawn = jnp.where(
            cannon_hit, RESPAWN_FRAMES, jnp.maximum(state.respawn - 1, 0)
        )

        # wave cleared → respawn grid one row lower (score keeps running)
        cleared = ~aliens.any()
        wave = state.wave + cleared.astype(jnp.int32)
        aliens = jnp.where(cleared, jnp.ones((ROWS, COLS), bool), aliens)
        grid_y = jnp.where(
            cleared,
            GRID_TOP0 + DROP * jnp.minimum(wave, 4).astype(jnp.float32),
            grid_y,
        )
        grid_x = jnp.where(cleared, 0.15, grid_x)

        # terminal: out of lives, or the LOWEST LIVING row reaches the
        # cannon line (using the full-grid bottom ended episodes while
        # survivors were still well above the cannon once low rows cleared)
        row_alive = aliens.any(axis=1)
        rowf = jnp.arange(ROWS, dtype=jnp.float32)
        low_row = jnp.max(jnp.where(row_alive, rowf, -1.0))
        lowest = grid_y + (low_row + 1.0) * CELL_H
        invaded = (state.aliens.any()) & (lowest >= CANNON_Y - 0.02)
        done = (lives <= 0) | invaded

        new = SpaceInvadersState(
            aliens=aliens,
            grid_x=grid_x,
            grid_y=grid_y,
            grid_dir=grid_dir,
            cannon_x=cannon_x,
            shot_x=shot_x,
            shot_y=shot_y,
            shot_live=shot_live,
            bomb_x=bomb_x,
            bomb_y=bomb_y,
            bomb_live=bomb_live,
            shields=shields,
            saucer_x=saucer_x,
            saucer_live=saucer_live,
            lives=lives,
            respawn=respawn,
            frame=frame,
            wave=wave,
        )
        return new, reward.astype(jnp.float32), done

    # -- rendering ---------------------------------------------------------
    def render(self, state) -> jax.Array:
        ys = jax.lax.broadcasted_iota(jnp.float32, (FRAME_H, FRAME_W), 0) / (
            FRAME_H - 1
        )
        xs = jax.lax.broadcasted_iota(jnp.float32, (FRAME_H, FRAME_W), 1) / (
            FRAME_W - 1
        )

        # aliens: map each pixel to its grid cell, test the live mask
        rel_x = xs - state.grid_x
        rel_y = ys - state.grid_y
        col = jnp.clip((rel_x / CELL_W).astype(jnp.int32), 0, COLS - 1)
        row = jnp.clip((rel_y / CELL_H).astype(jnp.int32), 0, ROWS - 1)
        in_grid = (
            (rel_x >= 0)
            & (rel_x < GRID_W)
            & (rel_y >= 0)
            & (rel_y < ROWS * CELL_H)
        )
        cx = state.grid_x + (col.astype(jnp.float32) + 0.5) * CELL_W
        cy = state.grid_y + (row.astype(jnp.float32) + 0.5) * CELL_H
        in_body = (jnp.abs(xs - cx) <= ALIEN_HALF_W) & (
            jnp.abs(ys - cy) <= ALIEN_HALF_H
        )
        alien_px = in_grid & in_body & state.aliens[row, col]

        # shields: hp-weighted brightness
        shield_centers = 0.2 + 0.3 * jnp.arange(N_SHIELDS, dtype=jnp.float32)
        s_idx = jnp.clip(
            jnp.argmin(jnp.abs(xs[..., None] - shield_centers), axis=-1),
            0, N_SHIELDS - 1,
        )
        s_over = jnp.abs(xs - shield_centers[s_idx]) <= SHIELD_HALF
        s_cell = jnp.clip(
            (
                (xs - (shield_centers[s_idx] - SHIELD_HALF))
                / (2 * SHIELD_HALF / SHIELD_CELLS)
            ).astype(jnp.int32),
            0, SHIELD_CELLS - 1,
        )
        hp = state.shields[s_idx, s_cell]
        shield_px = s_over & (jnp.abs(ys - SHIELD_Y) <= 0.012) & (hp > 0)
        shield_val = (40 + 25 * hp).astype(jnp.int32)

        cannon = (jnp.abs(xs - state.cannon_x) <= CANNON_HALF) & (
            jnp.abs(ys - CANNON_Y) <= 0.015
        )
        shot = (
            state.shot_live
            & (jnp.abs(xs - state.shot_x) <= 0.006)
            & (jnp.abs(ys - state.shot_y) <= 0.018)
        )
        bombs = (
            state.bomb_live[None, None, :]
            & (jnp.abs(xs[..., None] - state.bomb_x) <= 0.006)
            & (jnp.abs(ys[..., None] - state.bomb_y) <= 0.014)
        ).any(-1)

        saucer = (
            state.saucer_live
            & (jnp.abs(xs - state.saucer_x) <= SAUCER_HALF_W)
            & (jnp.abs(ys - SAUCER_Y) <= 0.012)
        )
        frame = (
            jnp.where(alien_px, 132, 0)
            + jnp.where(saucer, 170, 0)
            + jnp.where(shield_px, shield_val, 0)
            + jnp.where(cannon, 196, 0)
            + jnp.where(shot, 255, 0)
            + jnp.where(bombs, 88, 0)
        )
        return jnp.clip(frame, 0, 255).astype(jnp.uint8)


def make_space_invaders(train: bool = True) -> PixelEnv:
    return PixelEnv(SpaceInvaders(), train=train)
