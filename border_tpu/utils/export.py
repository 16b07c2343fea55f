"""Backend-free policy export: trained params → numpy-only inference.

≙ border-policy-no-backend (hand-rolled Mat matmul/relu/tanh + Mlp,
mat.rs:1-130, mlp.rs:9-44; bincode serialization) and the convert_policy
example (examples/gym/convert_policy/src/main.rs:1-235): a trained policy is
converted to a dependency-free artifact (.npz + json meta) and executed with
plain numpy — no JAX/flax at inference time.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Tuple

import numpy as np

ACTS = {
    "relu": lambda x: np.maximum(x, 0.0),
    "tanh": np.tanh,
    "sigmoid": lambda x: 1.0 / (1.0 + np.exp(-x)),
    "none": lambda x: x,
}


def _dense_layers(params: Dict[str, Any]) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Flatten a flax MLP param dict into ordered (W, b) pairs."""
    inner = params["params"] if "params" in params else params
    names = sorted(
        (k for k in inner if k.startswith("Dense_")),
        key=lambda k: int(k.split("_")[1]),
    )
    return [
        (np.asarray(inner[n]["kernel"]), np.asarray(inner[n]["bias"]))
        for n in names
    ]


def export_policy(agent, agent_state, path: str) -> str:
    """Write ``<path>/policy.npz`` + ``policy.json``; returns the dir.

    Supports MLP-family policies:
    - DQN/IQN-on-MLP: greedy argmax over Q logits (kind="argmax"),
    - SAC/AWAC/IQL: deterministic mean head with tanh|clamp limit
      (kind="gaussian_mean").
    """
    os.makedirs(path, exist_ok=True)
    kind_map = {
        "dqn": "argmax",
        "bc": "argmax",
        "sac": "gaussian_mean",
        "awac": "gaussian_mean",
        "iql": "gaussian_mean",
    }
    kind = kind_map.get(agent.name)
    if kind is None:
        raise ValueError(f"export not supported for agent {agent.name!r}")
    params = agent.policy_params(agent_state)
    layers = _dense_layers(params)

    meta: Dict[str, Any] = {"kind": kind, "activation": "relu", "n_layers": len(layers)}
    if kind == "gaussian_mean":
        # two-headed net: last two Dense are (mean, log_std) — keep mean only
        hidden, mean_head = layers[:-2], layers[-2]
        layers = hidden + [mean_head]
        meta["n_layers"] = len(layers)
        limit = getattr(agent.config, "action_limit", "tanh")
        meta["limit"] = limit
        if agent.name == "sac":
            meta["scale"] = np.asarray(agent.act_scale).tolist()
            meta["bias"] = np.asarray(agent.act_bias).tolist()
        else:
            meta["low"] = agent.act_low
            meta["high"] = agent.act_high
    if agent.name == "bc" and agent.config.action_mode == "continuous":
        meta["kind"] = "identity"

    arrays = {}
    for i, (w, b) in enumerate(layers):
        arrays[f"w{i}"] = w.astype(np.float32)
        arrays[f"b{i}"] = b.astype(np.float32)
    np.savez(os.path.join(path, "policy.npz"), **arrays)
    with open(os.path.join(path, "policy.json"), "w") as f:
        json.dump(meta, f)
    return path


class NumpyMLPPolicy:
    """Dependency-free policy runner (≙ pendulum_std example,
    examples/gym/pendulum_std/src/main.rs:115-173)."""

    def __init__(self, path: str):
        data = np.load(os.path.join(path, "policy.npz"))
        with open(os.path.join(path, "policy.json")) as f:
            self.meta = json.load(f)
        n = self.meta["n_layers"]
        self.layers = [(data[f"w{i}"], data[f"b{i}"]) for i in range(n)]
        self.act = ACTS[self.meta["activation"]]

    def __call__(self, obs: np.ndarray) -> np.ndarray:
        x = np.asarray(obs, np.float32)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None]
        for i, (w, b) in enumerate(self.layers):
            x = x @ w + b
            if i < len(self.layers) - 1:
                x = self.act(x)
        kind = self.meta["kind"]
        if kind == "argmax":
            out = np.argmax(x, axis=-1).astype(np.int32)
        elif kind == "gaussian_mean":
            if self.meta.get("limit", "tanh") == "tanh":
                out = np.tanh(x)
                if "scale" in self.meta:
                    out = out * np.asarray(self.meta["scale"], np.float32) + np.asarray(
                        self.meta["bias"], np.float32
                    )
            else:
                out = np.clip(x, self.meta["low"], self.meta["high"])
        else:  # identity
            out = x
        return out[0] if squeeze else out
