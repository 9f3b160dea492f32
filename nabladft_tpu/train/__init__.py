"""Training engine: SPMD fit/eval/predict, losses, metrics, checkpoints."""

from nabladft_tpu.train.checkpoints import CheckpointManager  # noqa: F401
from nabladft_tpu.train.engine import Trainer, TrainerConfig  # noqa: F401
from nabladft_tpu.train.loggers import CSVLogger, MultiLogger, StdoutLogger  # noqa: F401
from nabladft_tpu.train.metrics import MetricAccumulator  # noqa: F401
