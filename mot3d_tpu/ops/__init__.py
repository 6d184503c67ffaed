"""Compute ops: ROIAlign, NMS, segment reductions, precision helpers."""

from mot3d_tpu.ops.precision import high_precision
