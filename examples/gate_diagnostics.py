"""Why does the learned combined pipeline gate zero detections on fixtures?

The round-4 diffpose study trained 800 combined iters on MOTFront-format
fixtures with healthy detection losses (cls 0.006, voxel IoU 1.0) yet
tracking_loss stayed 0.0 and do_test MOTA 0: no detection ever survived the
postprocess gates.  This drive trains the detection-only step on the same
fixtures (faster than the combined step; same detector), then runs the
inference path and reports EACH gate's pass rate separately:

    raw predict validity (score_thresh_test 0.05 + NMS)
    objectness > 0.35                    (combined.objectness_thres)
    max 2D IoU vs GT >= 0.35             (combined.iou2d_thres)
    patch >= 3 px
    pose fit valid (RANSAC inliers)      (pose.min_inlier_ratio)
    3D IoU vs GT >= 0.01 (graph identity, tracking.box_iou_thres)

Run: PYTHONPATH=/root/repo:$PYTHONPATH python examples/gate_diagnostics.py
Env: GD_ITERS (default 600).
"""

import dataclasses
import os
import sys

import numpy as np

from mot3d_tpu.runtime import enable_compilation_cache, require_backend

enable_compilation_cache()

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    iters = int(os.environ.get("GD_ITERS", "600"))
    log("devices:", require_backend(300.0))

    from mot3d_tpu.config import default_config
    from mot3d_tpu.data.detection_loader import (iterate_detection_batches,
                                                 load_frame)
    from mot3d_tpu.data.fixtures import write_motfront_fixture
    from mot3d_tpu.data.motfront import MOTFrontDataset
    from mot3d_tpu.geometry.backproject import make_intrinsics
    from mot3d_tpu.geometry.iou3d import box2d_iou_matrix, box3d_iou_matrix
    from mot3d_tpu.models.mask_rcnn import MaskRCNN
    from mot3d_tpu.pose.pipeline import crop_gt_box3d, postprocess_frame
    from mot3d_tpu.train.detection_trainer import DetectionTrainer

    out = "out/diffpose_study/fixture_data"
    if not os.path.exists(os.path.join(out, "3D_front_mapping.csv")):
        write_motfront_fixture(out, "train", num_scenes=3, num_frames=8,
                               num_objects=3, seed=0)
        write_motfront_fixture(out, "test", num_scenes=2, num_frames=6,
                               num_objects=3, seed=100)
    cfg = default_config()
    cfg = cfg.replace(combined=dataclasses.replace(
        cfg.combined, eval_period=10 ** 9, checkpoint_period=10 ** 9))
    ds = MOTFrontDataset(out, "train", voxel_dir=os.path.join(out, "voxels"))
    test_ds = MOTFrontDataset(out, "test",
                              voxel_dir=os.path.join(out, "voxels"))
    trainer = DetectionTrainer(cfg, output_dir="out/gate_diag")
    batches = iterate_detection_batches(ds, cfg.detection, 2, epochs=10_000)
    log(f"training detection-only {iters} iters ...")
    trainer.train(batches, [], max_iter=iters)

    model = MaskRCNN(cfg.detection)
    predict = jax.jit(lambda p, im: model.apply(p, im,
                                                method=MaskRCNN.predict))
    cam = cfg.camera
    intr = make_intrinsics(cam.fx, cam.fy, cam.cx, cam.cy)
    c = cfg.combined

    crop = jax.jit(jax.vmap(
        lambda de, cp, b3, b2, m: crop_gt_box3d(de, cp, intr, b3, b2, m),
        in_axes=(None, None, 0, 0, 0)))
    pose_fn = jax.jit(lambda *a: postprocess_frame(*a[:11], intr, a[11],
                                                   a[12], cfg))

    stats = {k: 0 for k in ("frames", "slots", "nms_valid", "objectness",
                            "iou2d", "patch3px", "pose_valid", "gated",
                            "iou3d_id")}
    score_samples, iou_samples, iou3d_samples = [], [], []
    for scene in test_ds.scenes():
        frames = [load_frame(test_ds, fr, cfg.detection)
                  for fr in test_ds.load_scene(scene).frames]
        for fr in frames:
            images = jnp.asarray(fr.image)[None]
            dets = predict(trainer.state.params, images)
            v = np.asarray(dets.valid[0])
            s = np.asarray(dets.scores[0])
            bx = np.asarray(dets.boxes[0])
            stats["frames"] += 1
            stats["slots"] += v.size
            stats["nms_valid"] += int(v.sum())
            stats["objectness"] += int((v & (s > c.objectness_thres)).sum())
            iou = np.asarray(box2d_iou_matrix(
                dets.boxes[0], jnp.asarray(fr.boxes)))
            iou = np.where(np.asarray(fr.valid)[None, :], iou, -1)
            best2d = iou.max(1)
            stats["iou2d"] += int((v & (best2d >= c.iou2d_thres)).sum())
            pw = bx[:, 2] - bx[:, 0]
            ph = bx[:, 3] - bx[:, 1]
            stats["patch3px"] += int((v & ((pw >= 3) | (ph >= 3))).sum())
            score_samples.extend(s[v].tolist())
            iou_samples.extend(best2d[v].tolist())

            gt_masks = jnp.asarray(fr.masks[:, :cam.height, :cam.width])
            cropped = crop(jnp.asarray(fr.depth), jnp.asarray(fr.campose),
                           jnp.asarray(fr.boxes3d), jnp.asarray(fr.boxes),
                           gt_masks)
            frame = pose_fn(dets.boxes[0], dets.scores[0], dets.classes[0],
                            dets.valid[0], dets.masks[0], dets.voxels[0],
                            dets.nocs[0], jnp.asarray(fr.boxes),
                            jnp.asarray(fr.valid), jnp.asarray(fr.depth),
                            jnp.asarray(fr.campose), cropped,
                            jax.random.PRNGKey(0))
            fv = np.asarray(frame.valid)
            stats["gated"] += int(fv.sum())
            # pose fit validity alone: rerun with gates open
            cfg_open = cfg.replace(
                combined=dataclasses.replace(c, objectness_thres=-1.0,
                                             iou2d_thres=-1.0))
            frame_open = jax.jit(
                lambda *a: postprocess_frame(*a[:11], intr, a[11], a[12],
                                             cfg_open))(
                dets.boxes[0], dets.scores[0], dets.classes[0],
                dets.valid[0], dets.masks[0], dets.voxels[0], dets.nocs[0],
                jnp.asarray(fr.boxes), jnp.asarray(fr.valid),
                jnp.asarray(fr.depth), jnp.asarray(fr.campose), cropped,
                jax.random.PRNGKey(0))
            stats["pose_valid"] += int((v & np.asarray(
                frame_open.valid)).sum())
            i3 = np.asarray(box3d_iou_matrix(
                frame_open.pred_boxes, jnp.asarray(fr.boxes3d)))
            i3 = np.where(np.asarray(fr.valid)[None, :], i3, -1)
            best3d = i3.max(1)
            stats["iou3d_id"] += int(
                (fv & (best3d >= cfg.tracking.box_iou_thres)).sum())
            iou3d_samples.extend(best3d[fv].tolist())

    log("gate funnel (detections over all test frames):")
    for k in ("frames", "slots", "nms_valid", "objectness", "iou2d",
              "patch3px", "pose_valid", "gated", "iou3d_id"):
        log(f"  {k:>10}: {stats[k]}")
    for name, vals in (("scores", score_samples), ("iou2d", iou_samples),
                       ("iou3d", iou3d_samples)):
        if vals:
            a = np.array(vals)
            log(f"  {name}: median {np.median(a):.3f}, "
                f"p10 {np.percentile(a, 10):.3f}, "
                f"p90 {np.percentile(a, 90):.3f}")


if __name__ == "__main__":
    main()
