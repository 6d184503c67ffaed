"""Tracking stack: padded sequence graphs, trajectory assembly, MOT metrics."""

from mot3d_tpu.tracking.graph_builder import GraphTemplate, PaddedGraph, build_graph
from mot3d_tpu.tracking.tracker import Tracker
from mot3d_tpu.tracking.mot_metrics import MOTAccumulator, mot_summary
