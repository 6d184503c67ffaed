"""COCO-protocol detection AP (bbox + segm), host-side NumPy.

From-scratch implementation of the evaluation protocol used by the
reference's vendored `Detection/evaluator/CocoEvaluator.py` /
`FrontCocoEval.py` (pycocotools COCOeval): greedy per-image matching at IoU
thresholds 0.5:0.05:0.95, score-sorted, 101-point interpolated
precision-recall, AP / AP50 / AP75 / per-class AP, maxDets=100.
Area-range breakdowns are omitted (MOTFront objects are all one regime);
everything else follows the protocol.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from mot3d_tpu.evaluator import rle as rle_mod

IOU_THRESHOLDS = np.round(np.arange(0.5, 1.0, 0.05), 2)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


def _bbox_iou_matrix(dt: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """XYWH boxes -> IoU matrix (nd, ng)."""
    if len(dt) == 0 or len(gt) == 0:
        return np.zeros((len(dt), len(gt)))
    dx0, dy0 = dt[:, 0:1], dt[:, 1:2]
    dx1, dy1 = dx0 + dt[:, 2:3], dy0 + dt[:, 3:4]
    gx0, gy0 = gt[None, :, 0], gt[None, :, 1]
    gx1, gy1 = gx0 + gt[None, :, 2], gy0 + gt[None, :, 3]
    iw = np.clip(np.minimum(dx1, gx1) - np.maximum(dx0, gx0), 0, None)
    ih = np.clip(np.minimum(dy1, gy1) - np.maximum(dy0, gy0), 0, None)
    inter = iw * ih
    union = (dt[:, 2:3] * dt[:, 3:4]) + gt[None, :, 2] * gt[None, :, 3] - inter
    return np.where(union > 0, inter / union, 0.0)


def _match_image(dt_scores, ious, n_gt, thresholds):
    """Greedy COCO matching for one image+class.

    Returns tp (T, nd) bool in score-sorted order."""
    nd = len(dt_scores)
    order = np.argsort(-dt_scores, kind="mergesort")
    tp = np.zeros((len(thresholds), nd), bool)
    for ti, thr in enumerate(thresholds):
        gt_used = np.zeros(n_gt, bool)
        for rank, di in enumerate(order):
            best, best_iou = -1, thr
            for gi in range(n_gt):
                if gt_used[gi]:
                    continue
                if ious[di, gi] >= best_iou:
                    best, best_iou = gi, ious[di, gi]
            if best >= 0:
                gt_used[best] = True
                tp[ti, rank] = True
    return tp, dt_scores[order]


def compute_ap(per_image: List[dict], num_classes: int,
               iou_type: str = "bbox", max_dets: int = 100
               ) -> Dict[str, float]:
    """per_image: list of dicts with keys
         dt_boxes (N, 4) XYWH, dt_scores (N,), dt_classes (N,),
         gt_boxes (M, 4) XYWH, gt_classes (M,)
       and for iou_type == "segm" additionally dt_rles / gt_rles
       (lists of RLE dicts aligned with the boxes).
    Returns {"AP", "AP50", "AP75", "AP/<class id>"...}.
    """
    results: Dict[str, float] = {}
    ap_all = []
    per_class_ap: Dict[int, float] = {}
    for cls in range(num_classes):
        tps, scores_all, n_gt_total = [], [], 0
        for img in per_image:
            dt_sel = np.asarray(img["dt_classes"]) == cls
            gt_sel = np.asarray(img["gt_classes"]) == cls
            n_gt = int(gt_sel.sum())
            n_gt_total += n_gt
            if dt_sel.sum() == 0:
                continue
            dt_scores = np.asarray(img["dt_scores"])[dt_sel][:max_dets]
            if iou_type == "segm":
                dts = [r for r, s in zip(img["dt_rles"], dt_sel) if s]
                gts = [r for r, s in zip(img["gt_rles"], gt_sel) if s]
                ious = rle_mod.iou(dts[:max_dets], gts)
            else:
                ious = _bbox_iou_matrix(
                    np.asarray(img["dt_boxes"])[dt_sel][:max_dets],
                    np.asarray(img["gt_boxes"])[gt_sel])
            tp, sorted_scores = _match_image(dt_scores, ious, n_gt,
                                             IOU_THRESHOLDS)
            tps.append(tp)
            scores_all.append(sorted_scores)
        if n_gt_total == 0:
            continue
        if not tps:
            per_class_ap[cls] = 0.0
            ap_all.append(np.zeros(len(IOU_THRESHOLDS)))
            continue
        tp = np.concatenate(tps, axis=1)
        scores = np.concatenate(scores_all)
        order = np.argsort(-scores, kind="mergesort")
        tp = tp[:, order]
        cum_tp = np.cumsum(tp, axis=1)
        cum_fp = np.cumsum(~tp, axis=1)
        recall = cum_tp / n_gt_total
        precision = cum_tp / np.maximum(cum_tp + cum_fp, 1e-12)
        aps = np.zeros(len(IOU_THRESHOLDS))
        for ti in range(len(IOU_THRESHOLDS)):
            p = precision[ti]
            # monotone non-increasing envelope
            p = np.maximum.accumulate(p[::-1])[::-1]
            r = recall[ti]
            # 101-point interpolation
            idx = np.searchsorted(r, RECALL_POINTS, side="left")
            q = np.where(idx < len(p), p[np.minimum(idx, len(p) - 1)], 0.0)
            aps[ti] = q.mean()
        ap_all.append(aps)
        per_class_ap[cls] = float(aps.mean())

    if ap_all:
        stack = np.stack(ap_all)
        results["AP"] = float(stack.mean())
        results["AP50"] = float(stack[:, 0].mean())
        results["AP75"] = float(stack[:, 5].mean())
        for cls, v in per_class_ap.items():
            results[f"AP/class_{cls}"] = v
    return results


class COCOEvaluator:
    """Accumulating evaluator over padded detections.

    Mirrors the reference's COCOEvaluator usage
    (`Detection/evaluator/CocoEvaluator.py:32`, save_ap
    `EvaluatorUtils.py:358-415`): feed per-image padded detector outputs +
    ground truth, then `summarize()` for bbox (and segm when masks given) AP.
    """

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.per_image_bbox: List[dict] = []
        self.per_image_segm: List[dict] = []

    @staticmethod
    def _xyxy_to_xywh(b):
        b = np.asarray(b, np.float64)
        out = b.copy()
        out[:, 2] = b[:, 2] - b[:, 0]
        out[:, 3] = b[:, 3] - b[:, 1]
        return out

    def add_image(self, dt_boxes_xyxy, dt_scores, dt_classes, dt_valid,
                  gt_boxes_xyxy, gt_classes, gt_valid,
                  dt_masks=None, gt_masks=None):
        dv = np.asarray(dt_valid, bool)
        gv = np.asarray(gt_valid, bool)
        rec = {
            "dt_boxes": self._xyxy_to_xywh(np.asarray(dt_boxes_xyxy)[dv]),
            "dt_scores": np.asarray(dt_scores)[dv],
            "dt_classes": np.asarray(dt_classes)[dv],
            "gt_boxes": self._xyxy_to_xywh(np.asarray(gt_boxes_xyxy)[gv]),
            "gt_classes": np.asarray(gt_classes)[gv],
        }
        self.per_image_bbox.append(rec)
        if dt_masks is not None and gt_masks is not None:
            seg = dict(rec)
            seg["dt_rles"] = [rle_mod.encode(np.asarray(m) >= 0.5)
                              for m, s in zip(dt_masks, dv) if s]
            seg["gt_rles"] = [rle_mod.encode(np.asarray(m) >= 0.5)
                              for m, s in zip(gt_masks, gv) if s]
            self.per_image_segm.append(seg)

    def summarize(self) -> Dict[str, float]:
        out = {f"bbox/{k}": v for k, v in compute_ap(
            self.per_image_bbox, self.num_classes, "bbox").items()}
        if self.per_image_segm:
            out.update({f"segm/{k}": v for k, v in compute_ap(
                self.per_image_segm, self.num_classes, "segm").items()})
        return out
