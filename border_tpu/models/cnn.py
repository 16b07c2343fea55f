"""DQN-paper CNN for pixel observations.

≙ AtariCnn (border-tch-agent/src/cnn/base.rs:23-99): in-graph /255 scaling,
conv 32×8s4 → 64×4s2 → 64×3s1 → fc(3136→512)→out, with a ``skip_linear``
variant exposing the 512-d features (used as the IQN ψ feature extractor,
border-tch-agent/src/iqn/model/base.rs).

Input layout is NHWC (84×84×4 stacked frames) — channels-last is the
TPU-friendly layout; the reference's [N,4,84,84] torch layout is an NCHW-ism
we deliberately do not copy.  Compute in bfloat16 keeps conv GEMMs on the MXU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class AtariCNN(nn.Module):
    out_dim: int
    skip_linear: bool = False  # expose conv features only (IQN ψ)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # uint8 frames → [0,1] in-graph (≙ cnn/base.rs /255 scaling).
        x = x.astype(self.dtype) / jnp.asarray(255.0, self.dtype)
        x = nn.relu(nn.Conv(32, (8, 8), strides=(4, 4), padding="VALID",
                            dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(64, (4, 4), strides=(2, 2), padding="VALID",
                            dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(64, (3, 3), strides=(1, 1), padding="VALID",
                            dtype=self.dtype)(x))
        x = x.reshape(x.shape[0], -1)  # 7*7*64 = 3136
        x = nn.relu(nn.Dense(512, dtype=self.dtype)(x))
        if self.skip_linear:
            return x.astype(jnp.float32)
        return nn.Dense(self.out_dim, dtype=self.dtype)(x).astype(jnp.float32)
