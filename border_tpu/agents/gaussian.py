"""Gaussian policy helpers shared by the offline agents.

≙ border-candle-agent GaussianActor (util/actor.rs:19-305): clamped log-std,
Tanh or Clamp action limiting (ActionLimit, actor.rs:28-32), ``sample`` and
``logp`` with the atanh/log-Jacobian correction for the tanh limit.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

LOG_2 = 0.6931471805599453


def normal_logp(u: jax.Array, mean: jax.Array, log_std: jax.Array) -> jax.Array:
    """Σ_dims log N(u; mean, exp(log_std))."""
    std = jnp.exp(log_std)
    z = (u - mean) / std
    return jnp.sum(-0.5 * z**2 - log_std - 0.5 * jnp.log(2.0 * jnp.pi), axis=-1)


def sample(
    key: jax.Array,
    mean: jax.Array,
    log_std: jax.Array,
    limit: str = "clamp",
    low: float = -1.0,
    high: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """Draw an action and its log-prob under the given ActionLimit."""
    std = jnp.exp(log_std)
    u = mean + std * jax.random.normal(key, mean.shape)
    if limit == "tanh":
        a = jnp.tanh(u)
        logp = normal_logp(u, mean, log_std) - jnp.sum(
            2.0 * (LOG_2 - u - jax.nn.softplus(-2.0 * u)), axis=-1
        )
        return a, logp
    a = jnp.clip(u, low, high)
    return a, normal_logp(u, mean, log_std)


def logp_of(
    action: jax.Array,
    mean: jax.Array,
    log_std: jax.Array,
    limit: str = "clamp",
) -> jax.Array:
    """Log-prob of a *given* action (dataset actions for AWR-style losses;
    ≙ GaussianActor::logp with atanh inversion for tanh limit)."""
    if limit == "tanh":
        a = jnp.clip(action, -0.999995, 0.999995)
        u = jnp.arctanh(a)
        return normal_logp(u, mean, log_std) - jnp.sum(
            jnp.log(1.0 - a**2 + 1e-6), axis=-1
        )
    return normal_logp(action, mean, log_std)
