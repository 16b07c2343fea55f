"""Decoupled actor-learner over a device mesh.

Combines :class:`border_tpu.train.async_trainer.AsyncTrainer`'s
stale-params/periodic-sync shell with
:class:`border_tpu.parallel.sharded.ShardedTrainer`'s shard_map chunk —
the closest structural analogue of the reference's N-actor + learner +
sync_interval system (border-async-trainer/src/util.rs:31-92), with the
actor fleet as env shards on every device.
"""

from __future__ import annotations

from border_tpu.parallel.sharded import ShardedTrainer
from border_tpu.train.async_trainer import AsyncTrainer


class ShardedAsyncTrainer(AsyncTrainer, ShardedTrainer):
    """MRO: AsyncTrainer.train shell over ShardedTrainer's sharded chunk."""

    pass
