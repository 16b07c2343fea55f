"""Seaquest: an on-device Seaquest-class stepper in pure JAX.

Third pixel game — the reference's IQN parity config runs on ALE Seaquest
(BASELINE.md; border-tch-agent/src/iqn).  Core mechanics reproduced:
submarine with 3 lives, horizontal enemy fish to shoot (+20), divers to
rescue and surface with (+50 each), a depleting oxygen supply refilled at
the surface (oxygen-out costs a life), entity spawning pressure that makes
long survival progressively harder.  Entities live in fixed-size slot
arrays (8 enemies, 4 divers, 2 torpedoes) so the whole game stays
static-shape under vmap.

Action set: 6 (NOOP FIRE UP RIGHT LEFT DOWN); fire direction follows the
last horizontal facing. (ALE's full 18-combo set collapses to these
primitives.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from border_tpu.envs.pixel import FRAME_H, FRAME_W, PixelEnv, PixelGame

N_ENEMIES = 8
N_DIVERS = 4
N_TORPS = 2
SURFACE_Y = 0.12
SUB_SPEED = 0.012
ENEMY_SPEED = 0.008
TORP_SPEED = 0.035
O2_DRAIN = 1.0 / 2400.0
O2_FILL = 1.0 / 60.0
SPAWN_P_ENEMY = 0.02
SPAWN_P_DIVER = 0.008
HIT_R = 0.035
LIVES = 3


@struct.dataclass
class SeaquestState:
    sub_x: jax.Array
    sub_y: jax.Array
    facing: jax.Array  # +1 right, -1 left
    oxygen: jax.Array
    lives: jax.Array
    divers_held: jax.Array
    enemy_on: jax.Array  # [N_ENEMIES] bool
    enemy_x: jax.Array
    enemy_y: jax.Array
    enemy_dir: jax.Array
    diver_on: jax.Array  # [N_DIVERS]
    diver_x: jax.Array
    diver_y: jax.Array
    diver_dir: jax.Array
    torp_on: jax.Array  # [N_TORPS]
    torp_x: jax.Array
    torp_y: jax.Array
    torp_dir: jax.Array


class Seaquest(PixelGame):
    num_actions = 6
    name = "Seaquest-v0"
    max_frames = 27_000

    def init(self, key):
        k = jax.random.split(key, 2)
        return SeaquestState(
            sub_x=jax.random.uniform(k[0], (), jnp.float32, 0.3, 0.7),
            sub_y=jnp.float32(SURFACE_Y),
            facing=jnp.float32(1.0),
            oxygen=jnp.float32(1.0),
            lives=jnp.int32(LIVES),
            divers_held=jnp.int32(0),
            enemy_on=jnp.zeros(N_ENEMIES, bool),
            enemy_x=jnp.zeros(N_ENEMIES, jnp.float32),
            enemy_y=jnp.zeros(N_ENEMIES, jnp.float32),
            enemy_dir=jnp.ones(N_ENEMIES, jnp.float32),
            diver_on=jnp.zeros(N_DIVERS, bool),
            diver_x=jnp.zeros(N_DIVERS, jnp.float32),
            diver_y=jnp.zeros(N_DIVERS, jnp.float32),
            diver_dir=jnp.ones(N_DIVERS, jnp.float32),
            torp_on=jnp.zeros(N_TORPS, bool),
            torp_x=jnp.zeros(N_TORPS, jnp.float32),
            torp_y=jnp.zeros(N_TORPS, jnp.float32),
            torp_dir=jnp.ones(N_TORPS, jnp.float32),
        )

    def lives(self, state) -> jax.Array:
        return state.lives

    def _spawn(self, key, on, x, y, dirs, p):
        """Bernoulli spawn into the first free slot, random side/row."""
        k1, k2, k3 = jax.random.split(key, 3)
        do = jax.random.bernoulli(k1, p) & (~on.all())
        slot = jnp.argmin(on)  # first inactive slot
        from_left = jax.random.bernoulli(k2, 0.5)
        row = jax.random.uniform(k3, (), jnp.float32, 0.25, 0.9)
        on2 = on.at[slot].set(jnp.where(do, True, on[slot]))
        x2 = x.at[slot].set(jnp.where(do, jnp.where(from_left, 0.0, 1.0), x[slot]))
        y2 = y.at[slot].set(jnp.where(do, row, y[slot]))
        d2 = dirs.at[slot].set(jnp.where(do, jnp.where(from_left, 1.0, -1.0), dirs[slot]))
        return on2, x2, y2, d2

    def frame_step(self, key, state, action):
        a = action.astype(jnp.int32)
        dx = jnp.where(a == 3, 1.0, 0.0) - jnp.where(a == 4, 1.0, 0.0)
        dy = jnp.where(a == 5, 1.0, 0.0) - jnp.where(a == 2, 1.0, 0.0)
        facing = jnp.where(dx > 0, 1.0, jnp.where(dx < 0, -1.0, state.facing))
        sub_x = jnp.clip(state.sub_x + dx * SUB_SPEED, 0.03, 0.97)
        sub_y = jnp.clip(state.sub_y + dy * SUB_SPEED, SURFACE_Y, 0.92)

        # oxygen
        at_surface = sub_y <= SURFACE_Y + 0.005
        oxygen = jnp.where(
            at_surface,
            jnp.minimum(state.oxygen + O2_FILL, 1.0),
            state.oxygen - O2_DRAIN,
        )
        # surfacing with divers scores +50 each
        surfaced_now = at_surface & (state.sub_y > SURFACE_Y + 0.005)
        diver_bonus = jnp.where(
            surfaced_now, 50.0 * state.divers_held.astype(jnp.float32), 0.0
        )
        divers_held = jnp.where(surfaced_now, 0, state.divers_held)

        # fire a torpedo into the first free tube
        k_sp1, k_sp2, key = jax.random.split(key, 3)
        fire = a == 1
        free = jnp.argmin(state.torp_on)
        can_fire = fire & (~state.torp_on.all())
        torp_on = state.torp_on.at[free].set(
            jnp.where(can_fire, True, state.torp_on[free])
        )
        torp_x = state.torp_x.at[free].set(
            jnp.where(can_fire, sub_x, state.torp_x[free])
        )
        torp_y = state.torp_y.at[free].set(
            jnp.where(can_fire, sub_y, state.torp_y[free])
        )
        torp_dir = state.torp_dir.at[free].set(
            jnp.where(can_fire, facing, state.torp_dir[free])
        )
        # advance torpedoes
        torp_x = torp_x + torp_dir * TORP_SPEED * torp_on
        torp_on = torp_on & (torp_x > 0.0) & (torp_x < 1.0)

        # advance + spawn enemies and divers
        enemy_x = state.enemy_x + state.enemy_dir * ENEMY_SPEED * state.enemy_on
        enemy_on = state.enemy_on & (enemy_x > -0.02) & (enemy_x < 1.02)
        enemy_on, enemy_x, enemy_y, enemy_dir = self._spawn(
            k_sp1, enemy_on, enemy_x, state.enemy_y, state.enemy_dir, SPAWN_P_ENEMY
        )
        diver_x = state.diver_x + state.diver_dir * 0.5 * ENEMY_SPEED * state.diver_on
        diver_on = state.diver_on & (diver_x > -0.02) & (diver_x < 1.02)
        diver_on, diver_x, diver_y, diver_dir = self._spawn(
            k_sp2, diver_on, diver_x, state.diver_y, state.diver_dir, SPAWN_P_DIVER
        )

        # torpedo × enemy hits (+20 each)
        dx_te = jnp.abs(torp_x[:, None] - enemy_x[None, :])
        dy_te = jnp.abs(torp_y[:, None] - enemy_y[None, :])
        hits = (
            (dx_te < HIT_R)
            & (dy_te < HIT_R)
            & torp_on[:, None]
            & enemy_on[None, :]
        )
        enemy_killed = hits.any(axis=0)
        torp_spent = hits.any(axis=1)
        reward = 20.0 * enemy_killed.sum() + diver_bonus
        enemy_on = enemy_on & ~enemy_killed
        torp_on = torp_on & ~torp_spent

        # diver pickup (max 6 held, like the real game)
        near_diver = (
            (jnp.abs(diver_x - sub_x) < HIT_R)
            & (jnp.abs(diver_y - sub_y) < HIT_R)
            & diver_on
        )
        picked = near_diver & (divers_held + jnp.cumsum(near_diver) <= 6)
        divers_held = divers_held + picked.sum().astype(jnp.int32)
        diver_on = diver_on & ~picked

        # sub × enemy collision or oxygen out → life lost, respawn at surface
        hit_sub = (
            (jnp.abs(enemy_x - sub_x) < HIT_R)
            & (jnp.abs(enemy_y - sub_y) < HIT_R)
            & enemy_on
        ).any()
        died = hit_sub | (oxygen <= 0.0)
        lives = state.lives - died.astype(jnp.int32)
        sub_x = jnp.where(died, 0.5, sub_x)
        sub_y = jnp.where(died, SURFACE_Y, sub_y)
        oxygen = jnp.where(died, 1.0, oxygen)
        divers_held = jnp.where(died, 0, divers_held)
        enemy_on = enemy_on & ~died  # clear field on respawn

        done = lives <= 0
        new = SeaquestState(
            sub_x=sub_x, sub_y=sub_y, facing=facing, oxygen=oxygen,
            lives=lives, divers_held=divers_held,
            enemy_on=enemy_on, enemy_x=enemy_x, enemy_y=enemy_y, enemy_dir=enemy_dir,
            diver_on=diver_on, diver_x=diver_x, diver_y=diver_y, diver_dir=diver_dir,
            torp_on=torp_on, torp_x=torp_x, torp_y=torp_y, torp_dir=torp_dir,
        )
        return new, reward.astype(jnp.float32), done

    def render(self, state) -> jax.Array:
        ys = jax.lax.broadcasted_iota(jnp.float32, (FRAME_H, FRAME_W), 0) / (FRAME_H - 1)
        xs = jax.lax.broadcasted_iota(jnp.float32, (FRAME_H, FRAME_W), 1) / (FRAME_W - 1)

        def blob(px, py, on, rx, ry):
            # max over entity slots of an on-masked rectangle
            m = (
                (jnp.abs(xs[:, :, None] - px[None, None, :]) <= rx)
                & (jnp.abs(ys[:, :, None] - py[None, None, :]) <= ry)
                & on[None, None, :]
            )
            return m.any(axis=2)

        surface = jnp.abs(ys - SURFACE_Y) <= 0.006
        sub = (jnp.abs(xs - state.sub_x) <= 0.035) & (
            jnp.abs(ys - state.sub_y) <= 0.018
        )
        enemies = blob(state.enemy_x, state.enemy_y, state.enemy_on, 0.02, 0.012)
        divers = blob(state.diver_x, state.diver_y, state.diver_on, 0.012, 0.012)
        torps = blob(state.torp_x, state.torp_y, state.torp_on, 0.012, 0.005)
        o2_bar = (ys > 0.97) & (xs < state.oxygen)

        frame = jnp.zeros((FRAME_H, FRAME_W), jnp.float32)
        frame = jnp.where(surface, 60, frame)
        frame = jnp.where(enemies, 120, frame)
        frame = jnp.where(divers, 90, frame)
        frame = jnp.where(torps, 200, frame)
        frame = jnp.where(sub, 180, frame)
        frame = jnp.where(o2_bar, 255, frame)
        return frame.astype(jnp.uint8)


def make_seaquest(train: bool = True) -> PixelEnv:
    return PixelEnv(Seaquest(), train=train)
