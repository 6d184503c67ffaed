"""Sharded, jit-compiled sequence inference (the serving path).

The fused detect -> pose -> graph -> MPN program for one 25-frame sequence
(the same composition `bench.py` measures single-chip), lifted to a batch
of sequences sharded on the leading axis over the `data` mesh.  Parameters
are replicated; each device runs whole sequences end-to-end, so the forward
needs no collectives at all (embarrassingly parallel serving) and
throughput scales linearly in chips until HBM capacity.

Reference anchors: the eval-only end-to-end path
(`Detection/train_combined.py:128-433`) and tracking inference
(`Tracking/inference.py:19-21`), which the reference runs one sequence at a
time on one GPU.  Host-side trajectory assembly + MOTA stay on host
(`mot3d_tpu.tracking.Tracker`), consuming this step's outputs.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from mot3d_tpu.config import Config
from mot3d_tpu.geometry.backproject import make_intrinsics
from mot3d_tpu.models.mask_rcnn import MaskRCNN
from mot3d_tpu.models.mpn import TrackerModel
from mot3d_tpu.pose.pipeline import postprocess_frame
from mot3d_tpu.tracking.graph_builder import GraphTemplate, build_graph


class SequenceBatch(NamedTuple):
    """A batch of padded sequences, leading axis = batch (sharded over
    `data`).  GT fields serve the evaluation protocol (2D-IoU gate, depth
    cleaning, graph identity targets for MOTA) exactly as the reference's
    eval path does; zero them for office/no-GT serving."""

    images: jax.Array        # (B, T, H, W, 3)
    depth: jax.Array         # (B, T, H, W)
    campose: jax.Array       # (B, T, 4, 4)
    gt_boxes2d: jax.Array    # (B, T, M, 4)
    gt_valid2d: jax.Array    # (B, T, M) bool
    gt_boxes3d: jax.Array    # (B, T, M, 8, 3) world corners (graph identity)
    gt_boxes3d_cropped: jax.Array  # (B, T, M, 8, 3) camera-space depth crop
    gt_ids: jax.Array        # (B, T, M) int32
    gt_valid: jax.Array      # (B, T, M) bool
    keys: jax.Array          # (B, 2) uint32 PRNG keys (one per sequence)


class SequenceOutputs(NamedTuple):
    """Everything host-side assembly + MOTA need, one device fetch."""

    edge_probs: jax.Array    # (B, E) forward-half edge sigmoids
    obj_ids: jax.Array       # (B, T, I) GT identity per detection (-1 = FP)
    valid: jax.Array         # (B, T, I)
    translations: jax.Array  # (B, T, I, 3)
    classes: jax.Array       # (B, T, I)
    scores: jax.Array        # (B, T, I) detector objectness


def make_sequence_infer_step(det_model: MaskRCNN, trk_model: TrackerModel,
                             template: GraphTemplate, cfg: Config,
                             use_gt_gate: bool = True):
    """Build the batched inference step: (det_params, trk_params,
    SequenceBatch) -> SequenceOutputs.  jit it plain for one device, or
    `shard_batch` the SequenceBatch + `replicate` the params over a mesh."""
    cam = cfg.camera
    tcfg = cfg.tracking
    intrinsics = make_intrinsics(cam.fx, cam.fy, cam.cx, cam.cy)
    e_fwd = len(template.src_frame)

    def one_sequence(det_params, trk_params, images, depth, campose,
                     gt_boxes2d, gt_valid2d, gt_boxes3d, gt_boxes3d_cropped,
                     gt_ids, gt_valid, key):
        t_frames = images.shape[0]
        dets = det_model.apply(det_params, images, method=MaskRCNN.predict)
        keys = jax.random.split(key, t_frames)
        frames = jax.vmap(
            lambda bx, sc, cl, va, ma, vo, no, g2, gv, de, cp, g3, k:
            postprocess_frame(bx, sc, cl, va, ma, vo, no, g2, gv, de, cp,
                              intrinsics, g3, k, cfg,
                              use_gt_gate=use_gt_gate))(
            dets.boxes, dets.scores, dets.classes, dets.valid, dets.masks,
            dets.voxels, dets.nocs, gt_boxes2d, gt_valid2d, depth, campose,
            gt_boxes3d_cropped, keys)
        graph = build_graph(template, tcfg, frames.valid,
                            frames.translations, frames.rotations,
                            frames.scales, frames.pred_boxes,
                            gt_boxes3d, gt_ids, gt_valid)
        vox = frames.voxels.reshape(-1, *frames.voxels.shape[2:])
        logits = trk_model.apply(trk_params, vox, graph.src, graph.dst,
                                 graph.edge_attr, graph.edge_mask)
        return SequenceOutputs(
            edge_probs=jax.nn.sigmoid(logits[-1])[:e_fwd],
            obj_ids=graph.obj_ids,
            valid=frames.valid,
            translations=frames.translations,
            classes=frames.classes,
            scores=frames.objectness,
        )

    def step(det_params, trk_params, batch: SequenceBatch
             ) -> SequenceOutputs:
        return jax.vmap(one_sequence, in_axes=(None, None) + (0,) * 10)(
            det_params, trk_params, batch.images, batch.depth, batch.campose,
            batch.gt_boxes2d, batch.gt_valid2d, batch.gt_boxes3d,
            batch.gt_boxes3d_cropped, batch.gt_ids, batch.gt_valid,
            batch.keys)

    return step
