"""Observation/action space descriptions.

The reference expresses obs/act types as Rust marker traits
(border-core/src/base.rs:55-101) with concrete shapes hidden in converter
crates.  On TPU we need static shapes/dtypes up front — every space is a small
static-metadata object that can mint batched sample arrays and zero pytrees,
so envs, replay buffers, and networks can all be shape-inferred before trace
time.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict as DictT, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Space:
    """Base class for all spaces (static metadata, hashable, pytree-free)."""

    shape: Tuple[int, ...]
    dtype: Any

    def sample(self, key: jax.Array) -> jax.Array:
        raise NotImplementedError

    def zero(self) -> jax.Array:
        """A zero element of the space (used for replay-buffer allocation)."""
        return jnp.zeros(self.shape, dtype=self.dtype)

    def contains(self, x) -> bool:
        raise NotImplementedError

    @property
    def flat_dim(self) -> int:
        return int(np.prod(self.shape)) if self.shape else 1


@dataclasses.dataclass(frozen=True)
class Discrete(Space):
    """{0, 1, ..., n-1} with int32 representation."""

    n: int
    dtype: Any = jnp.int32

    @property
    def shape(self) -> Tuple[int, ...]:
        return ()

    def sample(self, key: jax.Array) -> jax.Array:
        return jax.random.randint(key, (), 0, self.n, dtype=self.dtype)

    def zero(self) -> jax.Array:
        return jnp.zeros((), dtype=self.dtype)

    def contains(self, x) -> bool:
        return bool((np.asarray(x) >= 0).all() and (np.asarray(x) < self.n).all())

    @property
    def flat_dim(self) -> int:
        return self.n


@dataclasses.dataclass(frozen=True)
class Box(Space):
    """Bounded (possibly unbounded) continuous box."""

    low: Any
    high: Any
    shape: Tuple[int, ...] = ()
    dtype: Any = jnp.float32

    def __post_init__(self):
        if not self.shape:
            s = np.shape(self.low) or np.shape(self.high)
            object.__setattr__(self, "shape", tuple(s))

    def sample(self, key: jax.Array) -> jax.Array:
        low = jnp.broadcast_to(jnp.asarray(self.low, self.dtype), self.shape)
        high = jnp.broadcast_to(jnp.asarray(self.high, self.dtype), self.shape)
        finite = jnp.isfinite(low) & jnp.isfinite(high)
        u = jax.random.uniform(key, self.shape, self.dtype)
        bounded = low + u * jnp.where(finite, high - low, 2.0)
        return jnp.where(finite, bounded, jax.random.normal(key, self.shape, self.dtype))

    def contains(self, x) -> bool:
        x = np.asarray(x)
        return bool(
            x.shape == self.shape
            and (x >= np.asarray(self.low) - 1e-6).all()
            and (x <= np.asarray(self.high) + 1e-6).all()
        )


@dataclasses.dataclass(frozen=True)
class Dict(Space):
    """Dict-structured space (FetchReach-style dict observations,
    ≙ border-py-gym-env candle dict-obs converters)."""

    spaces: Any  # mapping name -> Space; stored as tuple of (k, v) for hashability

    def __post_init__(self):
        if isinstance(self.spaces, dict):
            object.__setattr__(self, "spaces", tuple(sorted(self.spaces.items())))

    def as_dict(self) -> DictT[str, Space]:
        return dict(self.spaces)

    @property
    def shape(self):  # type: ignore[override]
        return {k: v.shape for k, v in self.spaces}

    @property
    def dtype(self):  # type: ignore[override]
        return {k: v.dtype for k, v in self.spaces}

    def sample(self, key: jax.Array):
        ks = jax.random.split(key, len(self.spaces))
        return {k: s.sample(kk) for (k, s), kk in zip(self.spaces, ks)}

    def zero(self):
        return {k: s.zero() for k, s in self.spaces}

    def contains(self, x) -> bool:
        d = dict(self.spaces)
        return isinstance(x, dict) and set(x) == set(d) and all(
            d[k].contains(v) for k, v in x.items()
        )

    @property
    def flat_dim(self) -> int:
        return sum(s.flat_dim for _, s in self.spaces)
