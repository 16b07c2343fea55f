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


class _Scaled255Conv(nn.Module):
    """conv1 with the /255 input scaling folded into its KERNEL:
    conv(x/255, W) + b = conv(x, W/255) + b.  The input-side divide
    materializes a full [B, 84, 84, 4] bf16 elementwise pass per forward
    (2× per update with the stacked next-forward — ~95 µs/update of pure
    HBM traffic in the r4 trace, artifacts/profile_trace/); scaling the
    8·8·4·32 kernel is ~free.  Param tree (kernel/bias, fp32) matches
    nn.Conv exactly, so checkpoints are interchangeable between modes."""

    features: int
    kernel_size: tuple
    strides: tuple
    dtype: Any

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.kernel_size, x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        k = (kernel / 255.0).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=self.strides, padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype)


class AtariCNN(nn.Module):
    out_dim: int
    skip_linear: bool = False  # expose conv features only (IQN ψ)
    dtype: Any = jnp.bfloat16
    # fold the /255 into conv1's kernel (numerics: allclose, not bitwise;
    # param tree unchanged so checkpoints work in either mode).  Default
    # ON: removes two [B,84,84,4] bf16 elementwise passes per double-DQN
    # update — measured +8% end-to-end updates/s on the v5e bench shape
    # (971 → 1049 b512-eq/s, artifacts/update_variants_r4_opts2.json)
    scale_in_kernel: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.scale_in_kernel:
            x = x.astype(self.dtype)  # raw 0..255; /255 lives in conv1
            x = nn.relu(_Scaled255Conv(32, (8, 8), (4, 4), self.dtype,
                                       name="Conv_0")(x))
        else:
            # uint8 frames → [0,1] in-graph (≙ cnn/base.rs /255 scaling)
            x = x.astype(self.dtype) / jnp.asarray(255.0, self.dtype)
            x = nn.relu(nn.Conv(32, (8, 8), strides=(4, 4), padding="VALID",
                                dtype=self.dtype, name="Conv_0")(x))
        x = nn.relu(nn.Conv(64, (4, 4), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name="Conv_1")(x))
        x = nn.relu(nn.Conv(64, (3, 3), strides=(1, 1), padding="VALID",
                            dtype=self.dtype, name="Conv_2")(x))
        x = x.reshape(x.shape[0], -1)  # 7*7*64 = 3136
        x = nn.relu(nn.Dense(512, dtype=self.dtype, name="Dense_0")(x))
        if self.skip_linear:
            return x.astype(jnp.float32)
        return nn.Dense(self.out_dim, dtype=self.dtype,
                        name="Dense_1")(x).astype(jnp.float32)
