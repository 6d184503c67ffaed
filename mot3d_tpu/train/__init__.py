"""Training orchestration: checkpointing, metrics, trainers."""

from mot3d_tpu.train.checkpoints import CheckpointManager
from mot3d_tpu.train.metrics_writer import MetricsWriter
