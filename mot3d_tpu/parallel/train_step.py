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
                             trk_opt: optax.GradientTransformation,
                             joint_grad: bool = True,
                             remat: bool = True,
                             accum_windows: bool = False):
    """joint_grad=True differentiates ONE scalar (detection total + tracking
    loss) w.r.t. (det_params, trk_params) in a single backward pass instead
    of the reference's two backward calls (`train_combined.py:546-553`).

    With the parity-default detached pose (cfg.pose.differentiable=False,
    `postprocess.py:151`), the tracking loss has zero gradient into
    det_params — stop_gradient cuts it inside the pose pipeline and the
    voxel binarisation cuts the appearance path — so the two forms produce
    IDENTICAL updates while the joint form traces/compiles/runs one forward
    + one backward instead of two of each (round-3 train bench:
    NOTES_ROUND3.md).  With cfg.pose.differentiable=True the joint form is
    the paper's namesake capability: d(tracking loss)/d(NOCS head) flows
    through the Umeyama/RANSAC solver.  joint_grad=False restores the
    reference's two-backward structure (needed to reproduce its exact
    update semantics when the pose is differentiable BUT the tracking
    gradient must still not reach the detector)."""
    if accum_windows and not joint_grad:
        # The two-backward path always vmaps over windows; silently running
        # it would reintroduce the exact full-memory layout accum_windows
        # exists to avoid (16 GB v5e OOM at bs=2 full-res).
        raise ValueError(
            "accum_windows=True requires joint_grad=True: gradient "
            "accumulation is only implemented for the joint single-backward "
            "step (the two-backward reference structure vmaps all windows "
            "at full activation memory)")
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

    if remat:
        # Rematerialise each window's forward in the backward pass instead
        # of storing its activations.  History: at the reference's bs=2
        # (2 windows x 2 frames, full MOTFront resolution) the round-3
        # step exceeded 16 GB v5e HBM without remat and crashed the remote
        # compiler WITH it (NOTES_ROUND3.md); after round 4 moved the mask
        # branch onto the foreground buffer (4x smaller pooled14 path),
        # BOTH full-shape B=2 forms compile and run
        # (examples/remat_crash_repro.py: res256 B2 remat0/remat1 both
        # OK).  remat stays the default for headroom at larger windows.
        window_forward = jax.checkpoint(window_forward)

    def window_loss(both, win, r):
        det_params, trk_params = both
        det_losses, tl = window_forward(det_params, trk_params, win, r)
        total = sum(v for k, v in det_losses.items()
                    if k.startswith("loss"))
        return total + tl, (total, tl, det_losses)

    def widen(batch: CombinedBatch) -> CombinedBatch:
        """Batches may arrive compact (uint8 images, bool masks/voxels —
        ~4x fewer H2D bytes over the tunnel, see
        detection_loader.compact_sample); widen to f32 on device."""
        return batch._replace(
            images=batch.images.astype(jnp.float32),
            gt_masks=batch.gt_masks.astype(jnp.float32),
            gt_voxels=batch.gt_voxels.astype(jnp.float32))

    def joint_step(state: CombinedTrainState, batch: CombinedBatch, rng):
        batch = widen(batch)
        b = batch.images.shape[0]
        rngs = jax.random.split(rng, b)

        if accum_windows and b > 1:
            # Gradient accumulation: one window in flight at a time
            # (lax.scan over the batch), summed grads / aux, ONE optimizer
            # update — identical update to the vmapped form (batch mean),
            # at 1/b the activation memory.  This is how the reference's
            # single-GPU bs=2 protocol fits one chip: the vmapped bs=2 step
            # at full MOTFront resolution over-subscribes the 16 GB v5e
            # even with remat (round-3 train bench).
            grad_fn = jax.value_and_grad(window_loss, has_aux=True)
            zero = jax.tree_util.tree_map(
                jnp.zeros_like, (state.det_params, state.trk_params))

            def body(g_acc, xs):
                win, r = xs
                (_, aux), g = grad_fn((state.det_params, state.trk_params),
                                      win, r)
                return jax.tree_util.tree_map(jnp.add, g_acc, g), aux

            grads, aux_stack = jax.lax.scan(body, zero, (batch, rngs))
            grads = jax.tree_util.tree_map(lambda x: x / b, grads)
            det_total, trk_total, det_losses = jax.tree_util.tree_map(
                lambda x: x.mean(0), aux_stack)
        else:
            def loss_fn(both):
                totals, aux = jax.vmap(
                    lambda win, r: window_loss(both, win, r))(batch, rngs)
                return totals.mean(), jax.tree_util.tree_map(
                    lambda x: x.mean(), aux)

            (_, (det_total, trk_total, det_losses)), grads = (
                jax.value_and_grad(loss_fn, has_aux=True)(
                    (state.det_params, state.trk_params)))
        det_grads, trk_grads = grads

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

    def step(state: CombinedTrainState, batch: CombinedBatch, rng):
        batch = widen(batch)
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

    out = joint_step if joint_grad else step
    # Exposed for the decision-invariant accumulation test: the scan path's
    # per-window gradient, runnable standalone as a sequential oracle
    # (tests/test_combined_step.py).
    out.window_grad_fn = jax.value_and_grad(window_loss, has_aux=True)
    return out
