"""Multi-process / multi-host runtime initialization.

≙ the cross-actor wiring of the reference's async trainer
(border-async-trainer/src/util.rs:31-92) lifted to real multi-host scale:
where Border connects actor threads with crossbeam channels inside one
process, the TPU build connects *processes* (one per host) into a single
SPMD program — ``jax.distributed.initialize`` joins every process to the
coordinator, after which ``jax.devices()`` is the GLOBAL device list and
:func:`border_tpu.parallel.make_mesh` builds DCN+ICI-spanning meshes.
Collectives inside the sharded trainer (psum over the ``actors`` axis) then
ride ICI within a host and DCN across hosts — no application-level
channels, no model-sync messages (params are replicated by construction).

On TPU pods the coordinator/process topology comes from the environment
and ``jax.distributed.initialize()`` needs no arguments.  For CPU-only
validation (the multi-host analogue of the reference's
threads-in-one-process doctest, border-async-trainer/src/lib.rs:1-137) the
gloo backend connects N local processes; see tests/test_multiprocess.py.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
    cpu_collectives: str = "gloo",
) -> None:
    """Join this process to the global JAX runtime.

    - On TPU pods: call with no arguments (topology from the TPU runtime).
    - Anywhere else (CPU validation, GPU clusters): pass coordinator
      address ``"host:port"``, total process count and this process's id.

    Must run before the first JAX computation.  After it returns,
    ``jax.devices()`` spans all processes and sharded trainers work
    unchanged over global meshes.
    """
    # NB: must not trigger backend initialization here (jax.default_backend()
    # would) — inspect the requested platform config/env instead.
    platforms = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    if platforms.startswith("cpu"):
        jax.config.update("jax_cpu_collectives_implementation", cpu_collectives)
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    if local_device_ids is not None:
        kwargs.update(local_device_ids=local_device_ids)
    jax.distributed.initialize(**kwargs)


def process_info() -> dict:
    """Topology snapshot for logs/records (≙ ActorStat's per-actor id,
    border-async-trainer/src/actor/stat.rs:1-23)."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }
