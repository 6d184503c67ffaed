"""Mask R-CNN R50-FPN with NOCS + voxel ROI heads — the detection model.

Re-design of the reference's detectron2 GeneralizedRCNN + VoxelNocsHeads
(`Detection/roi_heads/roi_heads.py:25-224`, configured at
`Detection/cfg_setup.py`) as a static-shaped flax model:

  - every stage is padded to config maxima (proposals, sampled ROIs,
    detections) with validity masks — no dynamic instance counts anywhere;
  - ROIAlign runs as separable per-box weight MATMULS against the packed
    FPN pyramid (ops/roi_align.py `multilevel_roi_align_packed` — MXU work
    instead of HBM gathers, level-select folded into the one-hot weights;
    measured 7x over the flattened-pyramid gather and 1.5x over the
    per-level matmul form at batch 25), NMS is the suppression-matrix scan
    (ops/nms.py);
  - mask targets use the channels-trick: all GT masks of an image are pooled
    at once as channels of a single ROIAlign, then the matched one is
    selected — no per-instance Python loop;
  - the voxel/NOCS heads run on a fixed-size buffer of the top positive ROIs
    (the reference computes them on all foreground proposals,
    `roi_heads.py:154-167`).

Train entry: `MaskRCNN.train_losses`; inference: `MaskRCNN.predict`
(+ `predict_given_boxes` mirroring forward_with_given_boxes_voxnocs,
`roi_heads.py:116-135`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mot3d_tpu.config import DetectionConfig
from mot3d_tpu.geometry.iou3d import box2d_iou_matrix
from mot3d_tpu.models.nocs_head import (NocsBinDecoder, NocsDecoder,
                                        nocs_bin_loss, nocs_bins_to_values,
                                        nocs_loss)
from mot3d_tpu.models.resnet_fpn import ResNetFPN
from mot3d_tpu.models.rpn import (RPNHead, decode_deltas, encode_deltas,
                                  generate_anchors, label_anchors,
                                  level_slices, rpn_losses, select_proposals,
                                  select_proposals_batched, smooth_l1,
                                  subsample_labels)
from mot3d_tpu.models.voxel_head import Pix2VoxDecoder, voxel_loss
from mot3d_tpu.ops.nms import (classwise_nms_mask, gather_rows,
                               top_k_by_score)
from mot3d_tpu.ops.roi_align import (multilevel_roi_align_batched_packed,
                                     multilevel_roi_align_packed, roi_align,
                                     roi_align_matmul)

STRIDES = (4, 8, 16, 32)          # P2..P5 (ROI pooling levels)
RPN_STRIDES = (4, 8, 16, 32, 64)  # + P6 for proposals


class GroundTruth(NamedTuple):
    """Padded per-image ground truth (leading batch dim B)."""

    boxes: jax.Array       # (B, M, 4) XYXY
    classes: jax.Array     # (B, M) int32
    valid: jax.Array       # (B, M) bool
    masks: jax.Array       # (B, M, H, W) {0,1}
    voxels: jax.Array      # (B, M, 32, 32, 32)
    nocs: jax.Array        # (B, M, P, P, 3) normalised GT NOCS crops


class Detections(NamedTuple):
    """Padded inference output (B, D, ...)."""

    boxes: jax.Array       # (B, D, 4)
    scores: jax.Array      # (B, D)
    classes: jax.Array     # (B, D)
    valid: jax.Array       # (B, D)
    masks: jax.Array       # (B, D, 28, 28) sigmoid probs
    voxels: jax.Array      # (B, D, 32, 32, 32) sigmoid probs
    nocs: jax.Array        # (B, D, 28, 28, 3) values in [0, 1]


class BoxHead(nn.Module):
    num_classes: int
    width: int = 1024
    dtype: object = None    # computation dtype (params stay f32)

    @nn.compact
    def __call__(self, pooled):  # (N, 7, 7, 256)
        # First FC contracts (h, w, c) directly with dot_general: the
        # flatten to (N, h*w*c) is a sublane-padding relayout on TPU
        # (7 -> 16 rows per bf16 tile), measured ~4 ms at batch 25x500
        # proposals; the MXU consumes the pooled layout as-is.  Same math
        # as Dense on the flattened vector (fan_in-scaled init to match).
        n, h, w, c = pooled.shape
        k1 = self.param(
            "fc1_kernel",
            nn.initializers.variance_scaling(1.0, "fan_in",
                                             "truncated_normal",
                                             in_axis=(0, 1, 2), out_axis=3),
            (h, w, c, self.width))
        b1 = self.param("fc1_bias", nn.initializers.zeros, (self.width,))
        dt = self.dtype or pooled.dtype
        x = jax.lax.dot_general(pooled.astype(dt), k1.astype(dt),
                                (((1, 2, 3), (0, 1, 2)), ((), ())),
                                preferred_element_type=jnp.float32)
        x = jax.nn.relu(x.astype(dt) + b1.astype(dt))
        x = jax.nn.relu(nn.Dense(self.width, dtype=self.dtype)(x))
        # Logits/deltas feed softmax thresholds + box decoding: f32 out.
        cls_logits = nn.Dense(self.num_classes + 1, name="cls",
                              dtype=self.dtype)(x).astype(jnp.float32)
        deltas = nn.Dense(self.num_classes * 4, name="box",
                          dtype=self.dtype)(x).astype(jnp.float32)
        return cls_logits, deltas.reshape(-1, self.num_classes, 4)


class MaskHead(nn.Module):
    num_classes: int
    width: int = 256
    dtype: object = None

    @nn.compact
    def __call__(self, pooled):  # (N, 14, 14, C)
        x = pooled
        for i in range(4):
            x = jax.nn.relu(nn.Conv(self.width, (3, 3), padding=1,
                                    dtype=self.dtype)(x))
        x = jax.nn.relu(
            nn.ConvTranspose(self.width, (2, 2), strides=(2, 2),
                             dtype=self.dtype)(x))  # 28x28
        return nn.Conv(self.num_classes, (1, 1),
                       dtype=self.dtype)(x).astype(jnp.float32)


class MaskRCNN(nn.Module):
    cfg: DetectionConfig

    def setup(self):
        c = self.cfg
        import jax.numpy as _jnp
        bb_dtype = (_jnp.bfloat16 if c.compute_dtype == "bfloat16" else None)
        self.backbone = ResNetFPN(c.backbone_depth, c.fpn_channels,
                                  c.backbone_width, bb_dtype, c.norm,
                                  c.stride_in_1x1)
        self.rpn_head = RPNHead(len(c.anchor_ratios), bb_dtype)
        self.box_head = BoxHead(c.num_classes, c.box_head_width, bb_dtype)
        self.mask_head = MaskHead(c.num_classes, c.mask_head_width, bb_dtype)
        if c.voxel_on:
            self.voxel_head = Pix2VoxDecoder(c.head_width_mult, bb_dtype,
                                             c.norm, c.voxel_torch_reshape)
        if c.nocs_on:
            self.nocs_head = (NocsBinDecoder(c.nocs_num_bins, bb_dtype,
                                             c.norm)
                              if c.nocs_use_bin_loss
                              else NocsDecoder(bb_dtype, c.norm))

    # ------------------------------------------------------------ helpers

    def _normalise(self, images):
        mean = jnp.asarray(self.cfg.pixel_mean)
        std = jnp.asarray(self.cfg.pixel_std)
        return (images - mean) / std

    def _anchors(self):
        c = self.cfg
        return jnp.asarray(generate_anchors(
            c.pad_height, c.pad_width, tuple(c.anchor_sizes),
            tuple(c.anchor_ratios), RPN_STRIDES, c.anchor_offset))

    def _slices(self):
        c = self.cfg
        return level_slices(c.pad_height, c.pad_width, len(c.anchor_ratios),
                            RPN_STRIDES)

    # ----------------------------------------------------------- training

    def train_losses(self, images, gt: GroundTruth, rng):
        """Full training forward -> dict of losses (+ metrics)."""
        c = self.cfg
        b = images.shape[0]
        feats = self.backbone(self._normalise(images))  # P2..P6
        objness, deltas = self.rpn_head(feats)
        anchors = self._anchors()
        slices = self._slices()

        rngs = jax.random.split(rng, 2 * b)

        # --- RPN losses + proposals: ONE vmapped program over the batch
        # (pure functions; an unrolled per-image loop duplicates the anchor
        # matching + NMS HLO per image and was a large share of the
        # combined-step compile time) ---
        targets = jax.vmap(
            lambda gb, gv: label_anchors(anchors, gb, gv, c.rpn_pos_iou,
                                         c.rpn_neg_iou))(gt.boxes, gt.valid)
        obj_ls, box_ls = jax.vmap(
            lambda o, d, t, r: rpn_losses(o, d, anchors, t, r,
                                          c.rpn_batch_per_image,
                                          c.rpn_positive_fraction))(
            objness, deltas, targets, rngs[:b])
        rpn_obj_l = obj_ls.mean()
        rpn_box_l = box_ls.mean()
        pb, ps, pv = select_proposals_batched(
            anchors, jax.lax.stop_gradient(objness),
            jax.lax.stop_gradient(deltas), slices,
            (c.pad_height, c.pad_width), c.rpn_pre_nms_topk_train,
            c.rpn_post_nms_topk_train, c.rpn_nms_thresh, not c.fast_nms)

        # --- ROI sampling (vmapped) + heads on the folded (B*R, ...) batch ---
        samples = jax.vmap(
            lambda pbi, pvi, gb, gc, gv, r: sample_rois(
                pbi, pvi, gb, gc, gv, r, c))(
            pb, pv, gt.boxes, gt.classes, gt.valid, rngs[b:])
        feats4 = list(feats[:4])
        pooled7 = multilevel_roi_align_batched_packed(
            feats4, samples.boxes, c.box_pooler_resolution, STRIDES)
        rr = samples.boxes.shape[1]
        pooled7 = pooled7.reshape((b * rr,) + pooled7.shape[2:])
        boxes_all = samples.boxes.reshape(b * rr, 4)
        valid_all = samples.valid.reshape(-1)
        is_pos_all = samples.is_pos.reshape(-1)
        cls_all = samples.gt_class.reshape(-1)
        matched_boxes = jax.vmap(lambda gb, mg: gb[mg])(
            gt.boxes, samples.matched_gt).reshape(b * rr, 4)

        cls_logits, box_deltas = self.box_head(pooled7)

        # Classification: bg class = num_classes.
        labels = jnp.where(is_pos_all, cls_all, c.num_classes)
        logp = jax.nn.log_softmax(cls_logits)
        ce = -jnp.take_along_axis(logp, labels[:, None], 1)[:, 0]
        n_valid = jnp.maximum(valid_all.sum(), 1.0)
        cls_loss = (ce * valid_all).sum() / n_valid

        # Class-specific box regression on positives.
        sel_deltas = jnp.take_along_axis(
            box_deltas, jnp.clip(cls_all, 0, c.num_classes - 1)[:, None, None]
            .repeat(4, -1), 1)[:, 0]
        gt_d = encode_deltas(boxes_all, matched_boxes)
        box_l = smooth_l1(sel_deltas - gt_d).sum(-1)
        box_loss = (box_l * is_pos_all).sum() / n_valid

        # --- per-image foreground buffer for the mask/voxel/NOCS branches.
        # detectron2 runs these heads on FOREGROUND proposals only
        # (select_foreground_proposals); pooling 14x14 features and running
        # the mask head + target ROIAlign over all R sampled ROIs was
        # 124.5 ms of the 179.7 ms bs=2 train step (examples/
        # train_profile.py).  k covers every possible positive: the sampler
        # caps positives at roi_batch_per_image * positive_fraction (~102)
        # < fg_head_buffer (128), so the selected set of positives — and
        # with it every loss value — is unchanged; only dead always-masked
        # background rows are dropped.
        n_pos_cap = int(c.roi_batch_per_image * c.roi_positive_fraction)
        if c.fg_head_buffer < n_pos_cap:
            raise ValueError(
                f"fg_head_buffer ({c.fg_head_buffer}) must cover the "
                f"sampler's positive cap roi_batch_per_image * "
                f"roi_positive_fraction = {n_pos_cap}; a smaller buffer "
                f"silently drops positives from the mask/voxel/NOCS losses")
        k_im = min(rr, c.fg_head_buffer)
        fg_rank_im = jnp.argsort(samples.is_pos <= 0, axis=1)[:, :k_im]
        fg_boxes_im = jnp.take_along_axis(
            samples.boxes, fg_rank_im[:, :, None], 1)       # (B, K, 4)
        fg_matched_im = jnp.take_along_axis(
            samples.matched_gt, fg_rank_im, 1)              # (B, K)
        pooled14 = multilevel_roi_align_batched_packed(
            feats4, fg_boxes_im, c.mask_pooler_resolution, STRIDES)
        pooled14 = pooled14.reshape((b * k_im,) + pooled14.shape[2:])
        fg_is_pos = jnp.take_along_axis(
            samples.is_pos, fg_rank_im, 1).reshape(-1)
        fg_cls_all = jnp.take_along_axis(
            samples.gt_class, fg_rank_im, 1).reshape(-1)
        fg_matched_all = fg_matched_im.reshape(-1)
        fg_boxes_all = fg_boxes_im.reshape(b * k_im, 4)
        fg_gt_boxes_all = jax.vmap(lambda gb, mg: gb[mg])(
            gt.boxes, fg_matched_im).reshape(b * k_im, 4)

        # Mask loss (channels trick for targets).
        mask_logits = self.mask_head(pooled14)
        sel_mask = jnp.take_along_axis(
            mask_logits, jnp.clip(fg_cls_all, 0, c.num_classes - 1)
            [:, None, None, None], -1)[..., 0]  # (B*K, 28, 28)
        def _mask_targets(m, bx, mg):
            mm = m.astype(jnp.float32).transpose(1, 2, 0)   # (H, W, M)
            # Separable-matmul ROIAlign: pooling full-res GT masks was the
            # remaining mask-branch hot spot after the fg-buffer fix (the
            # gather form walks (K, 28, 2, 28, 2, M) HBM indices).
            pooled_m = roi_align_matmul(mm, bx, 28)         # (K, 28, 28, M)
            return jnp.take_along_axis(
                pooled_m, mg[:, None, None, None], -1)[..., 0]

        mask_tgt = jax.vmap(_mask_targets)(
            gt.masks, fg_boxes_im, fg_matched_im)
        mask_tgt = (mask_tgt.reshape(b * k_im, 28, 28) >= 0.5).astype(
            jnp.float32)
        mask_bce = (mask_tgt * jax.nn.softplus(-sel_mask)
                    + (1 - mask_tgt) * jax.nn.softplus(sel_mask)).mean((1, 2))
        n_pos = jnp.maximum(fg_is_pos.sum(), 1.0)
        mask_loss = (mask_bce * fg_is_pos).sum() / n_pos

        losses = {
            "loss_rpn_cls": rpn_obj_l,
            "loss_rpn_loc": rpn_box_l,
            "loss_cls": cls_loss,
            "loss_box_reg": box_loss,
            "loss_mask": mask_loss,
        }

        # --- voxel + NOCS heads on a fixed buffer of top positives ---
        # (selected from the per-image fg buffer above — same global set:
        # the stable flat argsort orders positives image-0-major exactly as
        # the pre-r4 flat selection over all ROIs did.)
        if c.voxel_on or c.nocs_on:
            k_fg = min(c.fg_head_buffer, pooled14.shape[0])
            # rank positives first (stable)
            fg_rank = jnp.argsort(fg_is_pos <= 0)[:k_fg]
            fg_pooled = pooled14[fg_rank]
            fg_w = fg_is_pos[fg_rank].astype(jnp.float32)
            fg_cls = fg_cls_all[fg_rank]
            fg_boxes = fg_boxes_all[fg_rank]
            fg_gt_boxes = fg_gt_boxes_all[fg_rank]
            img_of = jnp.repeat(jnp.arange(b, dtype=jnp.int32),
                                k_im)[fg_rank]
            fg_matched = fg_matched_all[fg_rank]

            if c.voxel_on:
                vox_logits = self.voxel_head(fg_pooled)
                fg_gt_vox = gt.voxels[img_of, fg_matched]
                vl, viou = voxel_loss(vox_logits, fg_gt_vox, fg_w,
                                      c.voxel_loss_weight)
                losses["loss_voxel"] = vl
                losses["voxel_iou"] = viou
            if c.nocs_on:
                fg_gt_nocs = gt.nocs[img_of, fg_matched]
                # symmetric classes: 'table' (id 1 in MOTFRONT_CLASSES)
                sym = jnp.asarray([1], jnp.int32)
                if c.nocs_use_bin_loss:
                    nocs_logits = self.nocs_head(fg_pooled)
                    losses["loss_nocs"] = nocs_bin_loss(
                        nocs_logits, fg_gt_nocs, fg_boxes, fg_gt_boxes,
                        fg_cls, fg_w, sym, c.nocs_num_bins,
                        c.nocs_loss_weight)
                else:
                    nocs_pred = self.nocs_head(fg_pooled)
                    losses["loss_nocs"] = nocs_loss(
                        nocs_pred, fg_gt_nocs, fg_boxes, fg_gt_boxes,
                        fg_cls, fg_w, sym, c.nocs_loss_weight)
        return losses

    # ---------------------------------------------------------- inference

    def predict(self, images) -> Detections:
        """Inference with a measured hybrid batching layout (v5e, batch 25):

        - proposal selection / NMS / ROIAlign run per image — unrolled
          (cfg.predict_mode="unroll": each image's flattened FPN table
          (~13 MB bf16) stays VMEM-resident for its gathers, and the
          independent unrolled NMS chains schedule better than any batched
          form — vmap, one big batched matrix, or lax.map were each ~15%
          slower end to end in the round-2 A/B) or as ONE traced
          `lax.map` body ("scan": identical per-image semantics, HLO size
          constant in batch — the compile-time layout; round-3 A/B in
          NOTES_ROUND3.md);
        - the flax heads (box/mask/voxel/NOCS) run ONCE on the batch folded
          into the leading axis — big MXU matmuls instead of 25 small ones.
        """
        if self.cfg.predict_mode == "scan":
            return self._predict_scan(images)
        c = self.cfg
        b = images.shape[0]
        feats = self.backbone(self._normalise(images))
        objness, deltas = self.rpn_head(feats)
        anchors = self._anchors()
        slices = self._slices()
        feats4 = list(feats[:4])

        per_img = []
        for i in range(b):
            pb_i, _, pv_i = select_proposals(
                anchors, objness[i], deltas[i], slices,
                (c.pad_height, c.pad_width), c.rpn_pre_nms_topk_test,
                c.rpn_post_nms_topk_test, c.rpn_nms_thresh, not c.fast_nms)
            pooled7_i = multilevel_roi_align_packed(
                [f[i] for f in feats4], pb_i, c.box_pooler_resolution,
                STRIDES)
            # Box head per image: its first layer consumes the pooled
            # (P, 7, 7, 256) layout directly (dot_general in BoxHead), so
            # running it here avoids ever materialising the whole-batch
            # pooled stack (~313 MB bf16; folding the box head measured
            # ~4 ms slower at batch 25).
            cls_i, bd_i = self.box_head(pooled7_i)
            per_img.append((pb_i, pv_i, cls_i, bd_i))
        pb = jnp.stack([t[0] for t in per_img])
        pv = jnp.stack([t[1] for t in per_img])
        cls_logits = jnp.stack([t[2] for t in per_img])   # (B, P, C+1)
        box_deltas = jnp.stack([t[3] for t in per_img])   # (B, P, C, 4)
        p = pb.shape[1]
        cc = c.num_classes
        probs = jax.nn.softmax(cls_logits)[..., :cc]
        boxes_c = decode_deltas(pb[:, :, None, :], box_deltas)  # (B, P, C, 4)
        boxes_c = jnp.clip(
            boxes_c,
            jnp.zeros(4),
            jnp.asarray([c.pad_width, c.pad_height,
                         c.pad_width, c.pad_height], jnp.float32))
        flat_boxes = boxes_c.reshape(b, p * cc, 4)
        flat_scores = probs.reshape(b, p * cc)
        flat_cls = jnp.tile(jnp.arange(cc, dtype=jnp.int32), p)  # per image
        valid_pc = jnp.logical_and(                               # (B, P, C)
            pv[:, :, None], probs > c.score_thresh_test)

        finals = []
        for i in range(b):
            # Class-aware NMS as C block-diagonal (P, P) problems on the
            # (P, C) layout — same kept set as the flat offset-trick matrix
            # at 1/C of the IoU work; reshape restores the flat layout
            # (flat index = p*C + c).
            keep = classwise_nms_mask(boxes_c[i], probs[i], valid_pc[i],
                                      c.nms_thresh_test,
                                      not c.fast_nms).reshape(p * cc)
            idx, ok = top_k_by_score(
                jnp.where(keep, flat_scores[i], -jnp.inf), keep,
                c.detections_per_image)
            det_boxes_i = flat_boxes[i][idx]
            pooled14_i = multilevel_roi_align_packed(
                [f[i] for f in feats4], det_boxes_i,
                c.mask_pooler_resolution, STRIDES)
            finals.append((det_boxes_i,
                           jnp.where(ok, flat_scores[i][idx], 0.0),
                           flat_cls[idx], ok, pooled14_i))
        det_boxes = jnp.stack([t[0] for t in finals])
        det_scores = jnp.stack([t[1] for t in finals])
        det_cls = jnp.stack([t[2] for t in finals])
        ok = jnp.stack([t[3] for t in finals])
        pooled14 = jnp.stack([t[4] for t in finals])
        masks, voxels, nocs = self._dense_heads_pooled(
            pooled14.reshape((-1,) + pooled14.shape[2:]), det_cls.reshape(-1))
        d = det_boxes.shape[1]
        return Detections(
            det_boxes, det_scores, det_cls, ok,
            masks.reshape((b, d) + masks.shape[1:]),
            voxels.reshape((b, d) + voxels.shape[1:]),
            nocs.reshape((b, d) + nocs.shape[1:]))

    def _predict_scan(self, images) -> Detections:
        """`predict` with the per-image proposal/NMS/pooling chain as TWO
        `lax.map` bodies (around the folded-batch box head) instead of an
        unrolled loop.

        Identical outputs to the unrolled layout (same single-image ops,
        same flat gathers inside each body), but the chain's HLO is emitted
        once, not `batch` times — the unrolled 25-frame chain was the
        driver of the fused pipeline's 280 s cold compile (VERDICT r2
        weak #3).  The box head runs between the two maps on the folded
        (B*P, 7, 7, 256) stack so it stays one big MXU matmul.

        HBM note: folding the box head materialises the whole-batch pooled7
        stack (~313 MB bf16 at batch 25; S x that for multi-sequence
        programs) that the unrolled layout avoided by running the box head
        per image.  At very large batches on 16 GB HBM, fold the box head
        into stage1's body instead (ADVICE r3).
        """
        c = self.cfg
        b = images.shape[0]
        feats = self.backbone(self._normalise(images))
        objness, deltas = self.rpn_head(feats)
        anchors = self._anchors()
        slices = self._slices()
        feats4 = tuple(feats[:4])

        def stage1(x):
            o_i, d_i, f_i = x
            pb_i, _, pv_i = select_proposals(
                anchors, o_i, d_i, slices, (c.pad_height, c.pad_width),
                c.rpn_pre_nms_topk_test, c.rpn_post_nms_topk_test,
                c.rpn_nms_thresh, not c.fast_nms)
            pooled7_i = multilevel_roi_align_packed(
                list(f_i), pb_i, c.box_pooler_resolution, STRIDES)
            return pb_i, pv_i, pooled7_i

        pb, pv, pooled7 = jax.lax.map(stage1, (objness, deltas, feats4))
        p = pb.shape[1]
        cc = c.num_classes
        cls_logits, box_deltas = self.box_head(
            pooled7.reshape((b * p,) + pooled7.shape[2:]))
        probs = jax.nn.softmax(cls_logits.reshape(b, p, -1))[..., :cc]
        boxes_c = decode_deltas(pb[:, :, None, :],
                                box_deltas.reshape(b, p, cc, 4))
        boxes_c = jnp.clip(
            boxes_c, jnp.zeros(4),
            jnp.asarray([c.pad_width, c.pad_height,
                         c.pad_width, c.pad_height], jnp.float32))
        valid_pc = jnp.logical_and(pv[:, :, None], probs > c.score_thresh_test)
        flat_cls = jnp.tile(jnp.arange(cc, dtype=jnp.int32), p)

        def stage2(x):
            bx_i, pr_i, va_i, f_i = x
            keep = classwise_nms_mask(bx_i, pr_i, va_i, c.nms_thresh_test,
                                      not c.fast_nms).reshape(p * cc)
            fs_i = pr_i.reshape(p * cc)
            idx, ok_i = top_k_by_score(jnp.where(keep, fs_i, -jnp.inf), keep,
                                       c.detections_per_image)
            det_boxes_i = bx_i.reshape(p * cc, 4)[idx]
            pooled14_i = multilevel_roi_align_packed(
                list(f_i), det_boxes_i, c.mask_pooler_resolution, STRIDES)
            return (det_boxes_i, jnp.where(ok_i, fs_i[idx], 0.0),
                    flat_cls[idx], ok_i, pooled14_i)

        det_boxes, det_scores, det_cls, ok, pooled14 = jax.lax.map(
            stage2, (boxes_c, probs, valid_pc, feats4))
        masks, voxels, nocs = self._dense_heads_pooled(
            pooled14.reshape((-1,) + pooled14.shape[2:]), det_cls.reshape(-1))
        d = det_boxes.shape[1]
        return Detections(
            det_boxes, det_scores, det_cls, ok,
            masks.reshape((b, d) + masks.shape[1:]),
            voxels.reshape((b, d) + voxels.shape[1:]),
            nocs.reshape((b, d) + nocs.shape[1:]))

    def _dense_heads_pooled(self, pooled14, classes):
        c = self.cfg
        mask_logits = self.mask_head(pooled14)
        masks = jax.nn.sigmoid(jnp.take_along_axis(
            mask_logits, jnp.clip(classes, 0, c.num_classes - 1)
            [:, None, None, None], -1)[..., 0])
        if c.voxel_on:
            voxels = jax.nn.sigmoid(self.voxel_head(pooled14))
        else:
            voxels = jnp.zeros(pooled14.shape[:1] + (32, 32, 32))
        if c.nocs_on:
            if c.nocs_use_bin_loss:
                nocs = nocs_bins_to_values(self.nocs_head(pooled14),
                                           c.nocs_num_bins)
            else:
                nocs = self.nocs_head(pooled14)
        else:
            nocs = jnp.zeros(pooled14.shape[:1] + (28, 28, 3))
        return masks, voxels, nocs

    def predict_given_boxes(self, images, boxes, classes):
        """Voxel/NOCS/mask heads on externally supplied boxes
        (forward_with_given_boxes_voxnocs, `roi_heads.py:116-135`).

        boxes: (B, D, 4); classes: (B, D).  Pooling runs per image (VMEM-
        resident tables); the heads run once on the folded (B*D, ...) batch.
        """
        c = self.cfg
        b, d = boxes.shape[:2]
        feats = self.backbone(self._normalise(images))
        pooled14 = jnp.stack([
            multilevel_roi_align_packed([f[i] for f in feats[:4]], boxes[i],
                                 c.mask_pooler_resolution, STRIDES)
            for i in range(b)])
        masks, voxels, nocs = self._dense_heads_pooled(
            pooled14.reshape((-1,) + pooled14.shape[2:]), classes.reshape(-1))
        return (masks.reshape((b, d) + masks.shape[1:]),
                voxels.reshape((b, d) + voxels.shape[1:]),
                nocs.reshape((b, d) + nocs.shape[1:]))


class SampledRois(NamedTuple):
    boxes: jax.Array      # (R, 4)
    valid: jax.Array      # (R,)
    is_pos: jax.Array     # (R,) float {0,1}
    gt_class: jax.Array   # (R,) matched class (0-based)
    matched_gt: jax.Array  # (R,) index into gt slots


def sample_rois(prop_boxes, prop_valid, gt_boxes, gt_classes, gt_valid, rng,
                cfg: DetectionConfig) -> SampledRois:
    """Proposal-GT matching + fixed-count sampling for one image.

    detectron2 semantics with IOU_THRESHOLDS [0.75] / POSITIVE_FRACTION 0.2
    (`cfg_setup.py:63-66`): GT boxes are appended to the proposals, positives
    have max-IoU >= 0.75, everything else is background.
    """
    m = gt_boxes.shape[0]
    boxes = jnp.concatenate([prop_boxes, gt_boxes])
    valid = jnp.concatenate([prop_valid, gt_valid])
    iou = box2d_iou_matrix(boxes, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    matched = jnp.argmax(iou, 1)
    max_iou = jnp.max(iou, 1)
    labels = jnp.where(max_iou >= cfg.roi_iou_threshold, 1, 0)
    labels = jnp.where(valid, labels, -1)

    pos_sel, neg_sel = subsample_labels(labels, rng,
                                        cfg.roi_batch_per_image,
                                        cfg.roi_positive_fraction)
    sel = jnp.logical_or(pos_sel, neg_sel)
    # Compact selected rois into a fixed (roi_batch_per_image,) buffer,
    # positives first.
    score = jnp.where(pos_sel, 2.0, jnp.where(neg_sel, 1.0, 0.0))
    score = score + jax.random.uniform(rng, score.shape) * 1e-3
    num_rois = min(cfg.roi_batch_per_image, boxes.shape[0])
    idx, ok = top_k_by_score(score, sel, num_rois)
    return SampledRois(
        boxes=boxes[idx],
        valid=jnp.logical_and(ok, sel[idx]),
        is_pos=pos_sel[idx].astype(jnp.float32),
        gt_class=jnp.clip(gt_classes[matched[idx]], 0, None),
        matched_gt=matched[idx],
    )
