"""Implicit Quantile Network model.

≙ border-tch-agent IqnModel (iqn/model/base.rs:23-239): ψ feature extractor,
φ cosine embedding ``relu(linear(cos(τ·π·i)))`` (cos embed :161-191), merge
``f(ψ ⊙ φ)`` (forward :194-236).  Batched over quantile samples: the τ axis
is a plain array axis, so all K quantiles ride one MXU matmul.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from border_tpu.models.mlp import ACTIVATIONS


class IQNNet(nn.Module):
    """obs [B, ...] + taus [B, K] → quantile values [B, K, out_dim]."""

    out_dim: int
    feature_dim: int = 64
    n_cos: int = 64
    psi_hidden: Sequence[int] = (64,)  # MLP ψ; swap for AtariCNN features via psi_fn
    f_hidden: Sequence[int] = (64,)
    activation: str = "relu"
    dtype: Any = jnp.float32
    psi_fn: Any = None  # optional nn.Module class for ψ (e.g. AtariCNN skip_linear)

    @nn.compact
    def __call__(self, obs: jax.Array, taus: jax.Array) -> jax.Array:
        act = ACTIVATIONS[self.activation]

        # ψ: state features [B, F]
        if self.psi_fn is not None:
            psi = self.psi_fn(name="psi")(obs)
            psi = nn.Dense(self.feature_dim, dtype=self.dtype, name="psi_proj")(
                psi.astype(self.dtype)
            )
        else:
            x = obs.astype(self.dtype)
            for h in self.psi_hidden:
                x = act(nn.Dense(h, dtype=self.dtype)(x))
            psi = nn.Dense(self.feature_dim, dtype=self.dtype)(x)
        psi = act(psi)

        # φ: cosine embedding of τ → [B, K, F] (iqn/model/base.rs:161-191)
        i = jnp.arange(1, self.n_cos + 1, dtype=jnp.float32)
        cos = jnp.cos(taus[..., None] * jnp.pi * i)  # [B, K, n_cos]
        phi = act(
            nn.Dense(self.feature_dim, dtype=self.dtype, name="phi")(
                cos.astype(self.dtype)
            )
        )

        # merge f(ψ ⊙ φ) → quantile values (iqn/model/base.rs:194-236)
        z = psi[:, None, :] * phi  # [B, K, F]
        for h in self.f_hidden:
            z = act(nn.Dense(h, dtype=self.dtype)(z))
        out = nn.Dense(self.out_dim, dtype=self.dtype)(z)
        return out.astype(jnp.float32)  # [B, K, out_dim]
