"""Shared agent machinery: losses, target-network updates, optimizers.

≙ border-tch-agent/src/util.rs (track τ-polyak :31-45, param_stats :66-80,
CriticLoss {Mse, SmoothL1}) and border-candle-agent/src/util.rs
(gamma_not_done, smooth_l1).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax


def smooth_l1(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Per-element smooth-L1 (Huber δ=1), ≙ CriticLoss::SmoothL1."""
    d = pred - target
    a = jnp.abs(d)
    return jnp.where(a < 1.0, 0.5 * d * d, a - 0.5)


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    return (pred - target) ** 2


CRITIC_LOSSES = {"smooth_l1": smooth_l1, "mse": mse}


def quantile_huber_loss(
    pred: jax.Array, tgt: jax.Array, taus: jax.Array, kappa: float = 1.0
) -> jax.Array:
    """Quantile Huber loss between pred quantiles [B, Kp] at fractions
    ``taus`` [B, Kp] and target quantiles [B, Kt]
    (≙ quantile_huber_loss, border-tch-agent/src/util/quantile_loss.rs:7-13).

    Returns per-sample loss [B]: mean over target quantiles, sum over
    predicted quantiles (the IQN paper's convention, matching the
    reference's reduction in iqn/base.rs:63-170).
    """
    # pairwise TD errors u[b, kp, kt] = tgt[b, kt] - pred[b, kp]
    u = tgt[:, None, :] - pred[:, :, None]
    a = jnp.abs(u)
    huber = jnp.where(a <= kappa, 0.5 * u * u, kappa * (a - 0.5 * kappa))
    indicator = (u < 0.0).astype(jnp.float32)
    loss = jnp.abs(taus[:, :, None] - indicator) * huber / kappa
    return jnp.sum(jnp.mean(loss, axis=2), axis=1)


def polyak_update(tau: float, online: Any, target: Any) -> Any:
    """τ-polyak soft update: tgt ← τ·online + (1−τ)·tgt
    (≙ track(), border-tch-agent/src/util.rs:31-45)."""
    return jax.tree.map(lambda o, t: tau * o + (1.0 - tau) * t, online, target)


def periodic_polyak(
    n_opts: jax.Array, interval: int, tau: float, online: Any, target: Any
) -> Any:
    """Soft-update every ``interval`` optimizer steps (≙ the
    soft_update_interval counter in Dqn::opt_, dqn/base.rs:182-200).
    With interval=1, τ=0.005 this is SAC-style per-step polyak; with
    interval=10_000, τ=1.0 it is a hard DQN target swap."""
    do = (n_opts % interval) == 0

    def soft(_):
        return polyak_update(tau, online, target)

    return jax.lax.cond(do, soft, lambda _: target, None)


def maybe_pmean(tree: Any, axis_name) -> Any:
    """Cross-device gradient reduction for data-parallel training.

    When an agent runs inside a shard_map'd actor-learner program
    (border_tpu.parallel.sharded), ``axis_name`` names the mesh axis and
    gradients are psum-averaged over ICI — the TPU-native replacement for
    the reference's single-GPU learner fed by channels
    (border-async-trainer/src/async_trainer/base.rs:299-388).
    """
    if axis_name is None:
        return tree
    return jax.lax.pmean(tree, axis_name)


def make_optimizer(name: str = "adam", lr: float = 1e-3, **kw) -> optax.GradientTransformation:
    """≙ OptimizerConfig {Adam, AdamW} (border-tch-agent/src/opt.rs:13-84)."""
    if name == "adam":
        return optax.adam(lr, **kw)
    if name == "adamw":
        return optax.adamw(lr, **kw)
    if name == "sgd":
        return optax.sgd(lr, **kw)
    raise ValueError(f"unknown optimizer {name!r}")


def param_stats(params: Any, prefix: str = "") -> Dict[str, jax.Array]:
    """Per-tensor mean/std records (≙ param_stats, util.rs:66-80)."""
    out = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = prefix + "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out[f"{name}_mean"] = jnp.mean(leaf)
        out[f"{name}_std"] = jnp.std(leaf.astype(jnp.float32))
    return out


def gamma_not_done(gamma: float, terminated: jax.Array) -> jax.Array:
    """Bootstrap mask: γ·(1−terminated).  Truncated episodes still bootstrap
    (≙ gamma_not_done, border-candle-agent/src/util.rs; dqn/base.rs:91-105
    uses only is_terminated)."""
    return gamma * (1.0 - terminated.astype(jnp.float32))


def bootstrap_discount(gamma: float, batch) -> jax.Array:
    """Bootstrap factor for a sampled batch: γ·(1−terminated) for 1-step
    batches, or the buffer-provided γ^m·(1−terminated) when the batch
    carries n-step discounts."""
    not_done = 1.0 - batch.terminated.astype(jnp.float32)
    if getattr(batch, "discount", None) is not None:
        return batch.discount * not_done
    return gamma * not_done
