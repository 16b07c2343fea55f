"""Pixel game behavioral tests (Pong, Breakout)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from border_tpu.core.env import VecEnv
from border_tpu.envs import make


def _random_rollout(name, steps=600, n=8, train=True, seed=0):
    env = make(name, train=train)
    vec = VecEnv(env, n)
    state = vec.reset(jax.random.PRNGKey(seed))
    n_act = vec.action_space.n

    @jax.jit
    def roll(state, key):
        def body(st, k):
            acts = jax.random.randint(k, (n,), 0, n_act)
            ts, st = vec.step(st, acts)
            return st, (ts.reward, ts.terminated, ts.truncated)

        keys = jax.random.split(key, steps)
        return jax.lax.scan(body, state, keys)

    state, (rew, term, trunc) = roll(state, jax.random.PRNGKey(seed + 1))
    return state, np.asarray(rew), np.asarray(term), np.asarray(trunc)


def test_pong_random_policy_loses():
    state, rew, term, trunc = _random_rollout("Pong-v0", steps=1500, n=8)
    # opponent dominates a random agent, like real ALE Pong
    per_episode_proxy = rew.sum() / max(term.sum(), 1)
    assert rew.sum() < 0
    assert term.sum() > 0  # games reach 21 and end


def test_pong_obs_format():
    env = make("Pong-v0")
    vec = VecEnv(env, 2)
    state = vec.reset(jax.random.PRNGKey(0))
    assert state.obs.shape == (2, 84, 84, 4)
    assert state.obs.dtype == jnp.uint8


def test_breakout_bricks_break_and_lives_decrease():
    state, rew, term, trunc = _random_rollout("Breakout-v0", steps=1200, n=8)
    es = state.env_state
    bricks_left = np.asarray(es.game.bricks).reshape(8, -1).sum(axis=1)
    # random play should break at least some bricks somewhere
    assert rew.sum() > 0
    assert (bricks_left < 6 * 18).any()
    # episodic life: life losses mark terminations during training
    assert term.sum() > 0


def test_breakout_episodic_life_does_not_reset_game():
    """After a life loss the brick wall must persist (game continues)."""
    env = make("Breakout-v0", train=True)
    vec = VecEnv(env, 4)
    state = vec.reset(jax.random.PRNGKey(3))
    key = jax.random.PRNGKey(4)
    seen_life_loss_with_bricks_gone = False
    for i in range(400):
        key, k = jax.random.split(key)
        acts = jax.random.randint(k, (4,), 0, 4)
        ts, state = vec.step(state, acts)
        term = np.asarray(ts.terminated)
        if term.any():
            es = state.env_state
            lives = np.asarray(es.lives)
            bricks = np.asarray(es.game.bricks).reshape(4, -1).sum(axis=1)
            for e in np.where(term)[0]:
                if 0 < lives[e] < 5 and bricks[e] < 6 * 18:
                    seen_life_loss_with_bricks_gone = True
            if seen_life_loss_with_bricks_gone:
                break
    assert seen_life_loss_with_bricks_gone, (
        "never observed a continued game after life loss"
    )


def test_breakout_eval_mode_full_episodes():
    """Eval mode: only real game-over terminates (no episodic life)."""
    state, rew, term, trunc = _random_rollout(
        "Breakout-v0", steps=600, n=4, train=False
    )
    # with 5 lives, terminations should be much rarer than in train mode
    _, _, term_train, _ = _random_rollout("Breakout-v0", steps=600, n=4, train=True)
    assert term.sum() <= term_train.sum()


def test_seaquest_mechanics():
    state, rew, term, trunc = _random_rollout("Seaquest-v0", steps=800, n=8)
    es = state.env_state
    assert term.sum() > 0  # lives are lost
    assert (np.asarray(es.game.oxygen) <= 1.0).all()
    # enemies spawn and the field renders
    assert (np.asarray(state.obs[:, :, :, -1]) > 0).sum() > 0


def test_iqn_on_pixel_env_one_update():
    """IQN with CNN ψ runs one fused update on stacked frames."""
    import functools
    from border_tpu.agents import IQN, IQNConfig
    from border_tpu.models import AtariCNN
    from border_tpu.replay import FrameReplayBuffer
    from border_tpu.train import Trainer, TrainerConfig

    env = make("Seaquest-v0")
    agent = IQN(IQNConfig(
        psi_fn=functools.partial(AtariCNN, out_dim=0, skip_linear=True),
        feature_dim=32, n_cos=8, hidden=(32,),
    ))
    cfg = TrainerConfig(
        max_opts=2, warmup_period=8, opt_interval=64, batch_size=8,
        num_envs=4, steps_per_chunk=4, eval_interval=10**9,
    )
    buf = FrameReplayBuffer(capacity=32, num_envs=4)
    res = Trainer(env, agent, buf, cfg).train()
    assert res.opt_steps >= 2


def test_pong_frames_move():
    """Consecutive stacked frames differ (the ball/paddles animate)."""
    env = make("Pong-v0")
    vec = VecEnv(env, 1)
    state = vec.reset(jax.random.PRNGKey(0))
    for _ in range(30):
        ts, state = vec.step(state, jnp.zeros((1,), jnp.int32))
    obs = np.asarray(state.obs[0])
    assert not np.array_equal(obs[:, :, 0], obs[:, :, 3])


def test_freeway_mechanics():
    """Holding UP crosses and scores; collisions knock the chicken back;
    the timer terminates the episode."""
    import jax
    import jax.numpy as jnp

    from border_tpu.envs import make
    from border_tpu.envs.freeway import EPISODE_FRAMES, START_Y

    env = make("Freeway-v0", train=False)
    params = env.default_params
    key = jax.random.PRNGKey(0)
    obs, state = env.reset_env(key, params)
    assert obs.shape == (84, 84, 4) and obs.dtype == jnp.uint8

    step = jax.jit(lambda k, s, a: env.step_env(k, s, a, params))
    total_r = 0.0
    knocked = False
    prev_y = float(state.game.chicken_y)
    up = jnp.int32(1)
    for i in range(600):
        key, k = jax.random.split(key)
        obs, state, r, term, trunc, _ = step(k, state, up)
        y = float(state.game.chicken_y)
        if y > prev_y + 0.1:
            knocked = True
        prev_y = y
        total_r += float(r)
        if bool(term) or bool(trunc):
            break
    assert total_r >= 1.0, "holding UP never crossed"
    assert knocked, "no collision knockback observed"
    assert int(state.game.score) == int(total_r)

    # timer terminates
    state = state.replace(
        game=state.game.replace(frame=jnp.int32(EPISODE_FRAMES - 2))
    )
    obs, state, r, term, trunc, _ = step(key, state, jnp.int32(0))
    assert bool(term)


def test_freeway_up_beats_random():
    """Score ordering sanity: always-UP > random over the same horizon."""
    import jax
    import jax.numpy as jnp

    from border_tpu.envs import make

    env = make("Freeway-v0", train=False)
    params = env.default_params
    step = jax.jit(lambda k, s, a: env.step_env(k, s, a, params))

    def run(policy_fn, seed):
        key = jax.random.PRNGKey(seed)
        obs, state = env.reset_env(key, params)
        total = 0.0
        for i in range(400):
            key, k1, k2 = jax.random.split(key, 3)
            a = policy_fn(k1)
            obs, state, r, term, trunc, _ = step(k2, state, a)
            total += float(r)
        return total

    up = run(lambda k: jnp.int32(1), 0)
    rnd = run(lambda k: jax.random.randint(k, (), 0, 3), 0)
    assert up > rnd
