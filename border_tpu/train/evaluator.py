"""Policy evaluation.

≙ border-core DefaultEvaluator (evaluator/default_evaluator.rs:40-116):
n episodes with deterministic seeded resets (reset_with_index,
env.rs:162-180), mean return as the model-selection score.

On TPU all n episodes run *simultaneously* as one vmapped rollout of fixed
length: rewards accumulate only until each instance's first episode boundary,
so the result equals n sequential episodes.  The whole evaluation is a single
jitted ``lax.scan``.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from border_tpu.core.agent import Agent
from border_tpu.core.env import Environment, VecEnv
from border_tpu.record.record import Record


class Evaluator:
    def __init__(
        self,
        env: Environment,
        n_episodes: int = 5,
        max_steps: int = 1_000,
        base_seed: int = 424242,
    ):
        self.vec = VecEnv(env, n_episodes)
        self.n_episodes = n_episodes
        self.max_steps = max_steps
        self.base_key = jax.random.PRNGKey(base_seed)

    @partial(jax.jit, static_argnums=(0, 1))
    def _rollout(self, agent: Agent, agent_state, eval_index: jax.Array):
        vec_state = self.vec.reset_with_index(self.base_key, eval_index)
        act_key = jax.random.fold_in(self.base_key, eval_index + 1)

        def body(carry, key):
            vec_state, returns, lengths, running = carry
            action = agent.select_action_eval(agent_state, vec_state.obs, key)
            ts, vec_state = self.vec.step(vec_state, action)
            returns = returns + ts.reward * running
            lengths = lengths + running.astype(jnp.int32)
            running = jnp.logical_and(running > 0, ~ts.done).astype(jnp.float32)
            return (vec_state, returns, lengths, running), None

        init = (
            vec_state,
            jnp.zeros((self.n_episodes,), jnp.float32),
            jnp.zeros((self.n_episodes,), jnp.int32),
            jnp.ones((self.n_episodes,), jnp.float32),
        )
        keys = jax.random.split(act_key, self.max_steps)
        (vec_state, returns, lengths, _), _ = jax.lax.scan(body, init, keys)
        return returns, lengths

    def evaluate(self, agent: Agent, agent_state, eval_index: int = 0) -> Tuple[float, Record]:
        """Returns (model-selection score, record) ≙ Evaluator::evaluate
        (border-core/src/evaluator.rs:46-83)."""
        returns, lengths = self._rollout(agent, agent_state, jnp.int32(eval_index))
        score = float(jnp.mean(returns))
        record = Record(
            {
                "Episode return": score,
                "Episode return min": float(jnp.min(returns)),
                "Episode return max": float(jnp.max(returns)),
                "Episode length": float(jnp.mean(lengths)),
            }
        )
        return score, record
