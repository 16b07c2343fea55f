"""SpaceInvaders behavioral tests (5th pixel game).

Mirrors the per-game mechanics checks of tests/test_pixel_envs.py: obs
format, scoring, lives/episodic-life semantics, shield erosion, grid
march/descent.
"""

import jax
import jax.numpy as jnp
import numpy as np

from border_tpu.core.env import VecEnv
from border_tpu.envs import make
from border_tpu.envs.space_invaders import (
    LIVES,
    ROWS,
    COLS,
    SHIELD_HP,
)


def test_obs_format_and_random_rollout():
    env = make("SpaceInvaders-v0")
    vec = VecEnv(env, 4)
    state = vec.reset(jax.random.PRNGKey(0))
    assert state.obs.shape == (4, 84, 84, 4)
    assert state.obs.dtype == jnp.uint8

    @jax.jit
    def roll(state, key):
        def body(st, k):
            acts = jax.random.randint(k, (4,), 0, 6)
            ts, st = vec.step(st, acts)
            return st, (ts.reward, ts.terminated)

        keys = jax.random.split(key, 500)
        return jax.lax.scan(body, state, keys)

    state, (rew, term) = roll(state, jax.random.PRNGKey(1))
    rew, term = np.asarray(rew), np.asarray(term)
    # random play fires sometimes → kills some aliens (train mode sign-clips
    # to +1 per kill); bombs eventually hit → episodic-life terminations
    assert rew.sum() > 0
    assert term.sum() > 0


def test_fire_straight_up_scores_and_one_alien_dies():
    env = make("SpaceInvaders-v0", train=False)
    params = env.default_params
    obs, state = env.reset_env(jax.random.PRNGKey(3), params)
    step = jax.jit(lambda k, s, a: env.step_env(k, s, a, params))
    n0 = int(state.game.aliens.sum())
    assert n0 == ROWS * COLS
    key = jax.random.PRNGKey(4)
    total = 0.0
    for i in range(400):
        key, k = jax.random.split(key)
        obs, state, r, term, trunc, _ = step(k, state, jnp.int32(1))
        total += float(r)
        if bool(term):
            break
    assert total > 0.0, "always-FIRE never scored"
    assert int(state.game.aliens.sum()) < n0
    # eval mode: raw ALE row scores (multiples of 5, ≥ 5 per kill)
    assert total % 5 == 0 and total >= 5


def test_lives_and_episodic_life():
    """A bomb hit costs a life; in train mode that ends the learning
    episode WITHOUT resetting the game (PixelEnv.post_done_state)."""
    env = make("SpaceInvaders-v0", train=True)
    vec = VecEnv(env, 8)
    state = vec.reset(jax.random.PRNGKey(5))

    @jax.jit
    def roll(state, key):
        def body(st, k):
            # stand still: bombs find the cannon eventually
            ts, st = vec.step(st, jnp.zeros((8,), jnp.int32))
            return st, (ts.terminated, st.env_state.game.lives)

        keys = jax.random.split(key, 700)
        return jax.lax.scan(body, state, keys)

    state, (term, lives_t) = roll(state, jax.random.PRNGKey(6))
    lives_t = np.asarray(lives_t)  # [T, 8]
    # bombs hit: lives dropped below the initial count at some point
    # (the FINAL state may have auto-reset back to full lives)
    assert (lives_t < LIVES).any(), "no bomb ever hit a stationary cannon"
    # episodic life: each life loss terminated a learning episode
    assert np.asarray(term).sum() > 0
    # life losses decrement one at a time (never jump to 0 from 3)
    drops = lives_t[1:] - lives_t[:-1]
    assert drops.min() >= -1


def test_shields_erode():
    env = make("SpaceInvaders-v0", train=False)
    params = env.default_params
    obs, state = env.reset_env(jax.random.PRNGKey(7), params)
    # park the cannon under the middle shield and fire repeatedly
    game = state.game.replace(cannon_x=jnp.float32(0.5))
    state = state.replace(game=game)
    step = jax.jit(lambda k, s, a: env.step_env(k, s, a, params))
    key = jax.random.PRNGKey(8)
    for i in range(60):
        key, k = jax.random.split(key)
        obs, state, r, term, trunc, _ = step(k, state, jnp.int32(1))
    hp = np.asarray(state.game.shields)
    assert (hp < SHIELD_HP).any(), "firing through a shield never eroded it"


def test_grid_marches_and_descends():
    env = make("SpaceInvaders-v0", train=False)
    params = env.default_params
    obs, state = env.reset_env(jax.random.PRNGKey(9), params)
    step = jax.jit(lambda k, s, a: env.step_env(k, s, a, params))
    y0 = float(state.game.grid_y)
    xs = []
    key = jax.random.PRNGKey(10)
    for i in range(900):
        key, k = jax.random.split(key)
        obs, state, r, term, trunc, _ = step(k, state, jnp.int32(0))
        xs.append(float(state.game.grid_x))
        if float(state.game.grid_y) > y0:
            break
    assert max(xs) - min(xs) > 0.01, "grid never marched"
    assert float(state.game.grid_y) > y0, "grid never descended at an edge"


def _raw_game_state(key=11):
    from border_tpu.envs.space_invaders import SpaceInvaders

    game = SpaceInvaders()
    return game, game.init(jax.random.PRNGKey(key))


def test_shot_erodes_nearest_shield_both_sides():
    """ADVICE r3 #2: shield selection is by NEAREST center — shots over
    the LEFT half of every shield must block/erode it too (the old
    truncating index sent them through shields 1 and 2)."""
    from border_tpu.envs.space_invaders import SHIELD_Y, SHOT_SPEED

    game, s0 = _raw_game_state()
    step = jax.jit(game.frame_step)
    for shield_i, center in enumerate((0.2, 0.5, 0.8)):
        for x in (center - 0.03, center + 0.03):  # left and right halves
            s = s0.replace(
                shot_live=jnp.bool_(True),
                shot_x=jnp.float32(x),
                shot_y=jnp.float32(SHIELD_Y + SHOT_SPEED + 0.01),
            )
            new, r, done = step(jax.random.PRNGKey(12), s, jnp.int32(0))
            hp = np.asarray(new.shields)
            assert hp[shield_i].sum() < SHIELD_HP * hp.shape[1], (
                f"shot at x={x:.2f} failed to erode shield {shield_i}"
            )
            assert not bool(new.shot_live), (
                f"shot at x={x:.2f} passed through shield {shield_i}"
            )


def test_shot_kills_bottom_most_alien_when_band_spans_rows():
    """ADVICE r3 #4: an upward shot whose hit band covers two grid rows
    kills the BOTTOM row's alien (worth less), matching travel order."""
    from border_tpu.envs.space_invaders import (
        CELL_H, CELL_W, GRID_TOP0, SHOT_SPEED,
    )

    game, s0 = _raw_game_state()
    col = 2
    # shot ends the frame exactly between the centers of rows 4 and 5
    target_y = GRID_TOP0 + 5.0 * CELL_H
    shot_x = float(s0.grid_x) + (col + 0.5) * CELL_W
    s = s0.replace(
        shot_live=jnp.bool_(True),
        shot_x=jnp.float32(shot_x),
        shot_y=jnp.float32(target_y + SHOT_SPEED),
    )
    new, r, done = jax.jit(game.frame_step)(
        jax.random.PRNGKey(13), s, jnp.int32(0)
    )
    aliens = np.asarray(new.aliens)
    assert not aliens[5, col], "bottom-row alien survived"
    assert aliens[4, col], "top-row alien died instead of the bottom one"
    assert float(r) == 5.0  # bottom row scores 5, not row 4's 10


def test_invasion_uses_lowest_living_row():
    """ADVICE r3 #5: once the bottom rows are cleared, the episode must
    NOT end until a LIVING row reaches the cannon line."""
    from border_tpu.envs.space_invaders import CANNON_Y, CELL_H

    game, s0 = _raw_game_state()
    step = jax.jit(game.frame_step)

    # rows 3-5 dead; full-grid bottom edge past the old terminal line but
    # the lowest LIVING row (2) still far above the cannon
    aliens = np.ones((ROWS, COLS), bool)
    aliens[3:] = False
    gy = CANNON_Y - 0.02 - ROWS * CELL_H + 0.01
    s = s0.replace(aliens=jnp.asarray(aliens), grid_y=jnp.float32(gy))
    new, r, done = step(jax.random.PRNGKey(14), s, jnp.int32(0))
    assert not bool(done), "episode ended with survivors far above cannon"

    # only the top row alive and its bottom edge at the cannon line → done
    aliens2 = np.zeros((ROWS, COLS), bool)
    aliens2[0] = True
    gy2 = CANNON_Y - 0.02 - CELL_H + 0.001
    s2 = s0.replace(aliens=jnp.asarray(aliens2), grid_y=jnp.float32(gy2))
    new2, r2, done2 = step(jax.random.PRNGKey(15), s2, jnp.int32(0))
    assert bool(done2), "invasion by the lowest living row not detected"


def test_mystery_saucer_crosses_and_scores():
    """The mystery saucer spawns on its period, crosses the top track,
    and a player shot kills it for SAUCER_SCORE (ALE's bonus saucer,
    value fixed at 100 — divergence documented in DIVERGENCE.md)."""
    from border_tpu.envs.space_invaders import (
        SAUCER_PERIOD, SAUCER_SCORE, SAUCER_Y, SHOT_SPEED,
    )

    game, s0 = _raw_game_state()
    step = jax.jit(game.frame_step)

    # force a spawn: set frame so the next step hits the period
    s = s0.replace(frame=jnp.int32(SAUCER_PERIOD - 1))
    s1, r, done = step(jax.random.PRNGKey(20), s, jnp.int32(0))
    assert bool(s1.saucer_live), "saucer did not spawn on its period"
    x0 = float(s1.saucer_x)
    s2, _, _ = step(jax.random.PRNGKey(21), s1, jnp.int32(0))
    assert float(s2.saucer_x) > x0, "saucer did not move"

    # park a shot just below the saucer track → kill + score
    s3 = s2.replace(
        shot_live=jnp.bool_(True),
        shot_x=s2.saucer_x + jnp.float32(0.004),  # will stay in band
        shot_y=jnp.float32(SAUCER_Y + SHOT_SPEED),
    )
    s4, r4, _ = step(jax.random.PRNGKey(22), s3, jnp.int32(0))
    assert float(r4) == SAUCER_SCORE
    assert not bool(s4.saucer_live)
    assert not bool(s4.shot_live)

    # un-shot saucer expires at the right edge
    s5 = s2.replace(saucer_x=jnp.float32(0.979))
    s6, _, _ = step(jax.random.PRNGKey(23), s5, jnp.int32(0))
    assert not bool(s6.saucer_live)
