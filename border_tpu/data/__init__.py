"""Offline dataset ingestion.

≙ border-minari (MinariDataset → SimpleReplayBuffer,
border-minari/src/dataset.rs:13-217; normalized-score evaluation,
border-minari/src/evaluator.rs:13-73).
"""

from border_tpu.data.datasets import (  # noqa: F401
    OfflineDataset,
    collect_dataset,
    normalized_score,
    NormalizedEvaluator,
)
from border_tpu.data.minari import (  # noqa: F401
    GoalDictConverter,
    MinariConverter,
    MinariDataset,
    converter_for,
    list_local_datasets,
)
