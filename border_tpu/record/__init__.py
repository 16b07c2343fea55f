"""Observability: Record values, aggregation, and recorder sinks.

≙ border-core/src/record (Record/RecordValue/RecordStorage/Recorder,
record/base.rs:33-341, storage.rs:21-358, recorder.rs:26-108) plus the
tensorboard (border-tensorboard/src/lib.rs:17-126) and MLflow
(border-mlflow-tracking/src/recorder.rs:64-328) sinks.
"""

from border_tpu.record.record import Record, RecordStorage  # noqa: F401
from border_tpu.record.recorder import (  # noqa: F401
    BufferedRecorder,
    NullRecorder,
    Recorder,
    TensorboardRecorder,
)
from border_tpu.record.mlflow import MlflowClient, MlflowRecorder  # noqa: F401
