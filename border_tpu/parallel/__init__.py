"""Multi-device / multi-host scale-out.

TPU-native replacement for border-async-trainer: the reference's N actor
threads + crossbeam channels + Arc<Mutex> model sync
(border-async-trainer/src/actor_manager/base.rs:23-267, util.rs:31-92)
become a device mesh — env shards and replay shards live per-device, the
learner's gradients are psum-reduced over ICI, and "model sync" is either
nothing (synchronous single program) or a periodic replicated-param refresh
(decoupled mode, ≙ sync_interval semantics).
"""

from border_tpu.parallel.distributed import (  # noqa: F401
    init_distributed,
    process_info,
)
from border_tpu.parallel.gspmd import GSPMDTrainer, make_dp_tp_mesh  # noqa: F401
from border_tpu.parallel.mesh import make_mesh  # noqa: F401
from border_tpu.parallel.sharded import ShardedTrainer  # noqa: F401
from border_tpu.parallel.async_sharded import ShardedAsyncTrainer  # noqa: F401
