"""Neural networks: tracker (MPN family) and detector (Mask R-CNN family)."""

from mot3d_tpu.models.mpn import (
    MLP,
    VoxelEncoder,
    EdgeClassifier,
    MPGraph,
    TrackerModel,
)
