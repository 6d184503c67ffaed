"""Sharded, jit-compiled training steps.

Two steps mirror the reference's two training regimes:

  - tracking step (`Tracking/mpn_trainer.py:353-518`): batch of padded
    sequence graphs, sharded over the `data` mesh axis; one Adam update.
  - combined end-to-end step (`Detection/train_combined.py:481-569`): per
    iteration the reference runs a detection loss pass, a *second* full
    eval-mode forward, host pose fitting, graph construction and a tracking
    loss, then steps two optimizers independently
    (`losses.backward()` :546-548; `tracking_losses.backward(inputs=...)`
    :550-553).  Here the whole thing is ONE jit program: XLA CSE merges the
    duplicated backbone work, the pose solver runs on device, and the two
    optimizer updates act on disjoint parameter trees (the tracking gradient
    is cut from the detector by the pose pipeline's stop_gradient +
    voxel binarisation, matching the reference's detached pose at
    `Detection/tracker/postprocess.py:151`).

Data parallelism: batches are sharded on the leading axis over a 1-D mesh;
parameters/optimizer states are replicated; XLA emits the psum gradient
all-reduces over ICI (SURVEY.md §2.7, §5.8).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from mot3d_tpu.config import Config
from mot3d_tpu.models.mask_rcnn import GroundTruth, MaskRCNN
from mot3d_tpu.models.mpn import TrackerModel, tracker_loss
from mot3d_tpu.pose.pipeline import postprocess_frame
from mot3d_tpu.tracking.graph_builder import GraphTemplate, build_graph
from mot3d_tpu.geometry.backproject import make_intrinsics


# ------------------------------------------------------------- tracking


class TrackingTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


class TrackingBatch(NamedTuple):
    """Padded sequences, leading axis = batch (sharded over `data`)."""

    det_valid: jax.Array      # (B, T, I)
    translations: jax.Array   # (B, T, I, 3)
    rotations: jax.Array      # (B, T, I, 3)
    scales: jax.Array         # (B, T, I)
    pred_boxes: jax.Array     # (B, T, I, 8, 3)
    voxels: jax.Array         # (B, T, I, 32, 32, 32)
    gt_boxes: jax.Array       # (B, T, G, 8, 3)
    gt_ids: jax.Array         # (B, T, G)
    gt_valid: jax.Array       # (B, T, G)


def make_tracking_train_step(model: TrackerModel, template: GraphTemplate,
                             cfg: Config, optimizer: optax.GradientTransformation):
    """Returns a jittable (state, batch) -> (state, metrics) step."""

    def seq_loss(params, seq: TrackingBatch):
        graph = build_graph(template, cfg.tracking, seq.det_valid,
                            seq.translations, seq.rotations, seq.scales,
                            seq.pred_boxes, seq.gt_boxes, seq.gt_ids,
                            seq.gt_valid)
        vox = seq.voxels.reshape(-1, *seq.voxels.shape[-3:])
        logits = model.apply(params, vox, graph.src, graph.dst,
                             graph.edge_attr, graph.edge_mask)
        return tracker_loss(logits, graph.targets, graph.edge_mask)

    def step(state: TrackingTrainState, batch: TrackingBatch):
        def loss_fn(params):
            losses = jax.vmap(lambda s: seq_loss(params, s))(batch)
            return losses.mean()

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrackingTrainState(params, opt_state, state.step + 1),
                {"tracking_loss": loss})

    return step


# ------------------------------------------------------------- combined


class CombinedTrainState(NamedTuple):
    det_params: Any
    det_opt_state: Any
    trk_params: Any
    trk_opt_state: Any
    step: jax.Array


class CombinedBatch(NamedTuple):
    """Batch of sequence windows (leading axis sharded over `data`).

    The reference uses windows of 2 consecutive frames of one sequence
    (`train_combined.py:88,481`); T is configurable here.
    """

    images: jax.Array        # (B, T, Hp, Wp, 3)
    depth: jax.Array         # (B, T, H, W)
    campose: jax.Array       # (B, T, 4, 4)
    gt_boxes2d: jax.Array    # (B, T, M, 4)
    gt_classes: jax.Array    # (B, T, M)
    gt_valid: jax.Array      # (B, T, M)
    gt_masks: jax.Array      # (B, T, M, H, W)
    gt_voxels: jax.Array     # (B, T, M, 32, 32, 32)
    gt_nocs: jax.Array       # (B, T, M, P, P, 3)
    gt_boxes3d: jax.Array    # (B, T, M, 8, 3) world corner boxes
    gt_ids: jax.Array        # (B, T, M)


def make_combined_train_step(det_model: MaskRCNN, trk_model: TrackerModel,
                             template: GraphTemplate, cfg: Config,
                             det_opt: optax.GradientTransformation,
                             trk_opt: optax.GradientTransformation):
    cam = cfg.camera
    intrinsics = make_intrinsics(cam.fx, cam.fy, cam.cx, cam.cy)

    def window_forward(det_params, trk_params, win: CombinedBatch, rng):
        """One sequence window -> (detection loss dict, tracking loss)."""
        t_frames = win.images.shape[0]
        gt = GroundTruth(boxes=win.gt_boxes2d, classes=win.gt_classes,
                         valid=win.gt_valid, masks=win.gt_masks,
                         voxels=win.gt_voxels, nocs=win.gt_nocs)
        rng_det, rng_pose = jax.random.split(rng)
        det_losses = det_model.apply(det_params, win.images, gt, rng_det,
                                     method=MaskRCNN.train_losses)
        # Second, eval-mode pass (one jit program; XLA shares the backbone).
        dets = det_model.apply(det_params, win.images,
                               method=MaskRCNN.predict)

        keys = jax.random.split(rng_pose, t_frames)
        frames = jax.vmap(
            lambda i: postprocess_frame(
                dets.boxes[i], dets.scores[i], dets.classes[i],
                dets.valid[i], dets.masks[i], dets.voxels[i], dets.nocs[i],
                win.gt_boxes2d[i], win.gt_valid[i], win.depth[i],
                win.campose[i], intrinsics, win.gt_boxes3d[i], keys[i], cfg)
        )(jnp.arange(t_frames))

        graph = build_graph(template, cfg.tracking, frames.valid,
                            frames.translations, frames.rotations,
                            frames.scales, frames.pred_boxes,
                            win.gt_boxes3d, win.gt_ids, win.gt_valid)
        vox = frames.voxels.reshape(-1, 32, 32, 32)
        logits = trk_model.apply(trk_params, vox, graph.src, graph.dst,
                                 graph.edge_attr, graph.edge_mask)
        trk_loss = tracker_loss(logits, graph.targets, graph.edge_mask)
        # Guard the empty-graph case (reference's -inf sentinels,
        # mpn_trainer.py:565-571): no valid edges -> zero loss.
        has_edges = graph.edge_mask.any()
        trk_loss = jnp.where(has_edges, trk_loss, 0.0)
        return det_losses, trk_loss

    def step(state: CombinedTrainState, batch: CombinedBatch, rng):
        b = batch.images.shape[0]
        rngs = jax.random.split(rng, b)

        def det_loss_fn(det_params):
            def one(win, r):
                det_losses, _ = window_forward(det_params, state.trk_params,
                                               win, r)
                total = sum(v for k, v in det_losses.items()
                            if k.startswith("loss"))
                return total, det_losses
            totals, aux = jax.vmap(one)(batch, rngs)
            return totals.mean(), jax.tree_util.tree_map(
                lambda x: x.mean(), aux)

        def trk_loss_fn(trk_params):
            def one(win, r):
                _, tl = window_forward(state.det_params, trk_params, win, r)
                return tl
            return jax.vmap(one)(batch, rngs).mean()

        (det_total, det_losses), det_grads = jax.value_and_grad(
            det_loss_fn, has_aux=True)(state.det_params)
        trk_total, trk_grads = jax.value_and_grad(trk_loss_fn)(
            state.trk_params)

        det_updates, det_opt_state = det_opt.update(
            det_grads, state.det_opt_state, state.det_params)
        det_params = optax.apply_updates(state.det_params, det_updates)
        trk_updates, trk_opt_state = trk_opt.update(
            trk_grads, state.trk_opt_state, state.trk_params)
        trk_params = optax.apply_updates(state.trk_params, trk_updates)

        metrics = dict(det_losses)
        metrics["tracking_loss"] = trk_total
        metrics["detection_total"] = det_total
        return (CombinedTrainState(det_params, det_opt_state, trk_params,
                                   trk_opt_state, state.step + 1), metrics)

    return step
