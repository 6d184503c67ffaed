"""Detection evaluation: RLE masks, COCO-protocol AP, edge metrics."""

from mot3d_tpu.evaluator.rle import (encode, decode, merge, iou, area,
                                     to_string, from_string, bbox)
from mot3d_tpu.evaluator.coco_eval import COCOEvaluator, compute_ap
from mot3d_tpu.evaluator.edge_metrics import edge_precision_recall_f1
