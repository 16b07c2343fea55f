"""Training orchestration.

≙ border-core Trainer (trainer.rs:76-385), Sampler (trainer/sampler.rs),
Evaluator (evaluator/default_evaluator.rs) and border-async-trainer's
actor-learner system (async_trainer/base.rs:58-389).
"""

from border_tpu.train.config import TrainerConfig  # noqa: F401
from border_tpu.train.trainer import Trainer, TrainResult  # noqa: F401
from border_tpu.train.evaluator import Evaluator  # noqa: F401
from border_tpu.train.offline import OfflineTrainer  # noqa: F401
from border_tpu.train.async_trainer import AsyncTrainer  # noqa: F401
from border_tpu.train.host import HostEnvTrainer, HostEvaluator  # noqa: F401
from border_tpu.train.elastic import TrainingFailed, run_elastic  # noqa: F401
