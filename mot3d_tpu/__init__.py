"""mot3d_tpu — TPU-native 3D multi-object tracking with differentiable pose estimation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
DomiSchmauser/3D_MOT_Differentiable_Pose_Estimation (arXiv:2206.13785):

    RGB-D frame -> Mask R-CNN (R50-FPN) + NOCS head + voxel head
                -> differentiable 7-DoF Umeyama/RANSAC pose
                -> neural message-passing tracker -> MOTA.

Everything on the compute path is static-shaped, masked, and jit/vmap/pjit
friendly; variable instance counts are handled by padding + validity masks
instead of the reference's Python per-instance loops.

Subpackages:
    geometry  - backprojection, Umeyama/RANSAC, 3D IoU, outlier removal (pure JAX)
    ops       - ROIAlign, NMS, segment reductions (XLA / Pallas)
    models    - ResNet-FPN Mask R-CNN, NOCS/voxel heads, MPN tracker networks
    pose      - per-object pose pipeline (reference PoseEst/ equivalent)
    tracking  - graph building, trajectory assembly, MOT metrics
    data      - MOTFront readers/writers, synthetic fixtures
    parallel  - mesh/sharding helpers, pjit train steps
    train     - trainers, checkpointing, metric writer
    evaluator - COCO-style detection AP, RLE masks
"""

__version__ = "0.1.0"
