"""MLP models.

≙ border-tch-agent Mlp (mlp/base.rs:1-120) and the two-headed Mlp2
(mlp/mlp2.rs) used as the SAC actor, and border-candle-agent's Activation
enum (lib.rs:57-74).  ``dtype`` controls compute precision (bfloat16 keeps
the MXU fed); params stay float32.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

ACTIVATIONS = {
    "relu": nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": nn.sigmoid,
    "gelu": nn.gelu,
    "none": lambda x: x,
}


class MLP(nn.Module):
    """ReLU MLP: obs (or obs‖act) → out_dim (≙ Mlp, mlp/base.rs:1-120)."""

    out_dim: int
    hidden: Sequence[int] = (64, 64)
    activation: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        act = ACTIVATIONS[self.activation]
        x = x.astype(self.dtype)
        for h in self.hidden:
            x = act(nn.Dense(h, dtype=self.dtype)(x))
        return nn.Dense(self.out_dim, dtype=self.dtype)(x).astype(jnp.float32)


class DuelingMLP(nn.Module):
    """Dueling Q-head (Wang et al. 2016): shared trunk → V(s) + A(s,a),
    Q = V + A − mean(A).  A beyond-reference stabilizer for value
    estimation (the reference's DQN has no dueling variant); enabled via
    ``DQNConfig(dueling=True)``."""

    out_dim: int
    hidden: Sequence[int] = (64, 64)
    activation: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        act = ACTIVATIONS[self.activation]
        x = x.astype(self.dtype)
        for h in self.hidden:
            x = act(nn.Dense(h, dtype=self.dtype)(x))
        v = nn.Dense(1, dtype=self.dtype)(x)
        a = nn.Dense(self.out_dim, dtype=self.dtype)(x)
        q = v + a - jnp.mean(a, axis=-1, keepdims=True)
        return q.astype(jnp.float32)


class GaussianHeadMLP(nn.Module):
    """Two-headed (mean, log_std) MLP for stochastic actors
    (≙ Mlp2, mlp/mlp2.rs; GaussianActor clamp range
    border-candle-agent/src/util/actor.rs:19-305)."""

    act_dim: int
    hidden: Sequence[int] = (64, 64)
    activation: str = "relu"
    log_std_min: float = -20.0
    log_std_max: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        act = ACTIVATIONS[self.activation]
        x = x.astype(self.dtype)
        for h in self.hidden:
            x = act(nn.Dense(h, dtype=self.dtype)(x))
        mean = nn.Dense(self.act_dim, dtype=self.dtype)(x).astype(jnp.float32)
        log_std = nn.Dense(self.act_dim, dtype=self.dtype)(x).astype(jnp.float32)
        log_std = jnp.clip(log_std, self.log_std_min, self.log_std_max)
        return mean, log_std
