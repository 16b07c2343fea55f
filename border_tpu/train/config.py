"""Trainer configuration.

≙ TrainerConfig (border-core/src/trainer/config.rs:30-250) and
AsyncTrainerConfig (border-async-trainer/src/async_trainer/config.rs:10-113),
with the TPU-specific fusion knobs added: ``num_envs`` (the vectorized env
axis replacing N actor threads) and ``steps_per_chunk`` (how many env steps
are fused into one jitted ``lax.scan`` outer step).

The reference's update:sample ratio knobs carry over exactly
(SURVEY.md §7 "Update:sample ratio control"):

- ``opt_interval``: env steps between optimization rounds
  (trainer/config.rs; trainer.rs:197-228),
- ``n_updates_per_opt``: gradient steps per optimization round
  (≙ DqnConfig n_updates_per_opt, dqn/base.rs:182-200).

YAML round-trip (``save``/``load``) ≙ config.rs:225-249.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import yaml


@dataclasses.dataclass
class TrainerConfig:
    # -- loop extent (≙ trainer/config.rs fields) --------------------------
    max_opts: int = 10_000
    warmup_period: int = 1_000  # env steps before first update
    opt_interval: int = 1  # env steps per optimization round
    n_updates_per_opt: int = 1
    batch_size: int = 64
    # -- cadences ----------------------------------------------------------
    eval_interval: int = 1_000  # in opt steps
    eval_episodes: int = 5
    save_interval: int = 0  # 0 = disabled; else periodic model save
    flush_record_interval: int = 100
    record_compute_cost_interval: int = 1_000
    record_agent_info_interval: int = 0  # 0 = disabled (param_stats cadence)
    # -- TPU fusion knobs --------------------------------------------------
    num_envs: int = 128  # vectorized env axis (≙ N actors)
    steps_per_chunk: int = 64  # env steps fused per jitted outer step
    # prefetch the next update's replay sample inside the current scan
    # iteration (uniform replay only).  Default OFF: measured a uniform
    # ~12-15% LOSS on the v5e bench shape — carrying the 29 MB batch
    # through the scan costs more than any gather/compute overlap buys
    # (artifacts/update_variants_r4_opts.json)
    prefetch_sample: bool = False
    # lax.scan unroll factor for the update scan: unrolled bodies cut the
    # while-loop bookkeeping and let XLA schedule one body's replay
    # gather against the neighboring body's MXU compute
    update_scan_unroll: int = 1
    # draw ONE batch of updates_per_sample_batch × batch_size samples per
    # scan iteration and apply it as updates_per_sample_batch SEQUENTIAL
    # batch_size gradient steps (identical SGD semantics: same batch
    # size, same update count, iid uniform draws — only drawn together).
    # Amortizes the per-iteration scan overhead the r4 trace measured
    # (~166 µs while-loop self-time per update) and the per-dispatch
    # gather/transpose chain over k updates.  Uniform replay only (PER's
    # next draw depends on the previous update's priorities).
    updates_per_sample_batch: int = 1
    # -- misc --------------------------------------------------------------
    seed: int = 0
    # async-equivalent (≙ AsyncTrainerConfig::sync_interval) — only used by
    # the decoupled actor-fleet mode in border_tpu.parallel.actor_learner.
    sync_interval: int = 100

    # -- YAML round-trip (≙ config.rs:225-249) -----------------------------
    def save(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(dataclasses.asdict(self), f)

    @classmethod
    def load(cls, path: str) -> "TrainerConfig":
        with open(path) as f:
            return cls(**yaml.safe_load(f))

    def replace(self, **kw) -> "TrainerConfig":
        return dataclasses.replace(self, **kw)
