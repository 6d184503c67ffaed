"""Multi-chip parallelism: mesh construction + sharded train steps."""

from mot3d_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from mot3d_tpu.parallel.train_step import (
    TrackingTrainState,
    make_tracking_train_step,
    CombinedTrainState,
    make_combined_train_step,
)
from mot3d_tpu.parallel.infer_step import (
    SequenceBatch,
    SequenceOutputs,
    make_sequence_infer_step,
)
