"""Round-5 quality campaign: make learned end-to-end quality nonzero.

The round-4 verdict's remaining evidence gap: every learned-pipeline quality
number was 0 because (a) fixture NOCS targets were corrupted by the
point-scatter renderer (fixed: analytic ray-box rasteriser,
`data/fixtures.py`) and (b) training ran 600 iters on 24 images while the
reference protocol is 240k iters on 2381 scenes
(`Detection/cfg_setup.py:108-118`).  This campaign runs the protocol shape
at fixture scale:

  1. detection-only pretrain on ~50 scenes for QC_DET_ITERS steps
     (the reference trains the detector first; combined training then
     starts from `best_model.pth`, `Detection/cfg_setup.py:137`);
  2. gate-funnel report on held-out test scenes (same funnel as
     examples/gate_diagnostics.py — objectness 0.35 / 2D-IoU 0.35 /
     pose-valid / 3D-IoU identity 0.01,
     `Detection/train_combined.py:507`, `Tracking/mpn_trainer.py:46`);
  3. combined training (detached vs differentiable pose) warm-started
     from the pretrained detector, then do_test MOTA/IDF1 + pose errors
     — the detached-vs-differentiable comparison the framework is named
     for (`Detection/tracker/postprocess.py:151`).

Run: PYTHONPATH=/root/repo python examples/quality_campaign.py
Env: QC_OUT (out/quality_r5), QC_DET_ITERS (12000), QC_COMB_ITERS (1500),
     QC_TRAIN_SCENES (48), QC_TEST_SCENES (6), QC_FRAMES (10),
     QC_OBJECTS (3), QC_PHASES (data,det,funnel,combined).
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

from mot3d_tpu.runtime import enable_compilation_cache, require_backend

enable_compilation_cache()

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


OUT = os.environ.get("QC_OUT", "out/quality_r5")
DET_ITERS = int(os.environ.get("QC_DET_ITERS", "12000"))
COMB_ITERS = int(os.environ.get("QC_COMB_ITERS", "1500"))
TRAIN_SCENES = int(os.environ.get("QC_TRAIN_SCENES", "48"))
TEST_SCENES = int(os.environ.get("QC_TEST_SCENES", "6"))
FRAMES = int(os.environ.get("QC_FRAMES", "10"))
OBJECTS = int(os.environ.get("QC_OBJECTS", "3"))
PHASES = os.environ.get("QC_PHASES", "data,det,funnel,combined").split(",")
DATA = os.path.join(OUT, "fixture_data")


def make_data():
    from mot3d_tpu.data.fixtures import write_motfront_fixture

    if os.path.exists(os.path.join(DATA, "3D_front_mapping.csv")):
        log("[data] exists, skipping")
        return
    t0 = time.time()
    # MOTFront-realistic furniture sizes (~100-180 px): best-anchor IoU
    # must clear the ROI sampler's 0.75 threshold often enough to feed the
    # box head positives from a from-scratch RPN (see fixtures.py note).
    big = dict(half_range=(0.35, 0.6), camera_dist=2.6, area=1.3)
    write_motfront_fixture(DATA, "train", num_scenes=TRAIN_SCENES,
                           num_frames=FRAMES, num_objects=OBJECTS, seed=0,
                           **big)
    write_motfront_fixture(DATA, "test", num_scenes=TEST_SCENES,
                           num_frames=FRAMES, num_objects=OBJECTS, seed=500,
                           **big)
    log(f"[data] {TRAIN_SCENES}+{TEST_SCENES} scenes x {FRAMES} frames "
        f"in {time.time() - t0:.0f}s")


ZOO_ITERS = int(os.environ.get("QC_ZOO_ITERS", "12000"))
# The reference's SOLVER.BASE_LR=8e-4 is an SGD+momentum rate
# (detectron2's default optimizer); fed to our AdamW it is 10-100x too
# hot and produced periodic divergence spikes that left the run at a
# worse equilibrium than step 2000 (NOTES_ROUND5.md finding 4).
LR = float(os.environ.get("QC_LR", "2e-4"))


def det_pretrain(cfg):
    """Two-stage detector training mirroring the reference's real recipe.

    The reference NEVER trains its 0.75-ROI-threshold config from
    scratch: it starts from COCO model-zoo weights
    (`Detection/cfg_setup.py:21`) that were themselves trained with
    detectron2's DEFAULT 0.5 threshold.  From scratch, 0.75 starves the
    box head (measured: 4 positives / 512 sampled ROIs -> the head
    collapses to background and predict() emits nothing).  So: stage A
    trains the zoo recipe (threshold 0.5, rich positives, calibrated
    scores, sharp RPN); stage B fine-tunes the reference's exact config
    (0.75) warm-started from stage A — the same structure as
    zoo-pretrain -> MOTFront fine-tune."""
    from mot3d_tpu.data.detection_loader import iterate_detection_batches
    from mot3d_tpu.data.motfront import MOTFrontDataset
    from mot3d_tpu.train.detection_trainer import DetectionTrainer

    ds = MOTFrontDataset(DATA, "train",
                         voxel_dir=os.path.join(DATA, "voxels"))
    n_frames = sum(len(ds.load_scene(s).frames) for s in ds.scenes())

    def batches(c):
        return iterate_detection_batches(
            ds, c.detection, c.combined.batch_size, epochs=10 ** 6,
            cache_samples=n_frames, seed=1)

    zoo_cfg = cfg.replace(detection=dataclasses.replace(
        cfg.detection, roi_iou_threshold=0.5))
    zoo = DetectionTrainer(zoo_cfg, output_dir=os.path.join(OUT, "det_zoo"))
    t0 = time.time()
    log(f"[det:zoo] stage A (thr 0.5): {ZOO_ITERS} iters on "
        f"{n_frames} frames ...")
    final = zoo.train(batches(zoo_cfg), None, max_iter=ZOO_ITERS,
                      resume=True)
    zoo.ckpt.save(int(zoo.state.step), zoo.state)
    log(f"[det:zoo] done in {time.time() - t0:.0f}s: "
        + " ".join(f"{k}={v:.4f}" for k, v in sorted(final.items())))

    trainer = DetectionTrainer(cfg, output_dir=os.path.join(OUT, "det"))
    t0 = time.time()
    log(f"[det] stage B (reference cfg, thr "
        f"{cfg.detection.roi_iou_threshold}): {DET_ITERS} iters ...")
    final = trainer.train(batches(cfg), None, max_iter=DET_ITERS,
                          resume=True, init_params=zoo.state.params)
    step = int(trainer.state.step)
    trainer.ckpt.save(step, trainer.state)
    log(f"[det] done at step {step} in {time.time() - t0:.0f}s: "
        + " ".join(f"{k}={v:.4f}" for k, v in sorted(final.items())))
    return trainer


def restore_det(cfg):
    """Template-restore the final detection checkpoint (no training)."""
    from mot3d_tpu.data.detection_loader import iterate_detection_batches
    from mot3d_tpu.data.motfront import MOTFrontDataset
    from mot3d_tpu.train.detection_trainer import DetectionTrainer

    ds = MOTFrontDataset(DATA, "train",
                         voxel_dir=os.path.join(DATA, "voxels"))
    trainer = DetectionTrainer(cfg, output_dir=os.path.join(OUT, "det"))
    batch = next(iterate_detection_batches(ds, cfg.detection,
                                           cfg.combined.batch_size,
                                           shuffle=False))
    trainer.init_state(batch)
    from mot3d_tpu.train.checkpoints import resume_trainer
    step = resume_trainer(trainer)
    if step is None:
        raise RuntimeError("no detection checkpoint; run the det phase")
    return trainer


def funnel(cfg, det_params):
    """Per-gate detection counts over all test frames (gate_diagnostics)."""
    from mot3d_tpu.data.detection_loader import load_frame
    from mot3d_tpu.data.motfront import MOTFrontDataset
    from mot3d_tpu.geometry.backproject import make_intrinsics
    from mot3d_tpu.geometry.iou3d import box2d_iou_matrix, box3d_iou_matrix
    from mot3d_tpu.models.mask_rcnn import MaskRCNN
    from mot3d_tpu.pose.pipeline import crop_gt_box3d, postprocess_frame

    test_ds = MOTFrontDataset(DATA, "test",
                              voxel_dir=os.path.join(DATA, "voxels"))
    model = MaskRCNN(cfg.detection)
    predict = jax.jit(lambda p, im: model.apply(p, im,
                                                method=MaskRCNN.predict))
    cam = cfg.camera
    intr = make_intrinsics(cam.fx, cam.fy, cam.cx, cam.cy)
    c = cfg.combined
    cfg_open = cfg.replace(combined=dataclasses.replace(
        c, objectness_thres=-1.0, iou2d_thres=-1.0))
    crop = jax.jit(jax.vmap(
        lambda de, cp, b3, b2, m: crop_gt_box3d(de, cp, intr, b3, b2, m),
        in_axes=(None, None, 0, 0, 0)))
    pose_fn = jax.jit(lambda *a: postprocess_frame(*a[:11], intr, a[11],
                                                   a[12], cfg))
    pose_open = jax.jit(lambda *a: postprocess_frame(*a[:11], intr, a[11],
                                                     a[12], cfg_open))

    stats = {k: 0 for k in ("frames", "slots", "nms_valid", "objectness",
                            "iou2d", "pose_valid", "gated", "iou3d_id")}
    samples = {"scores": [], "iou2d": [], "iou3d": []}
    for scene in test_ds.scenes():
        frames = [load_frame(test_ds, fr, cfg.detection)
                  for fr in test_ds.load_scene(scene).frames]
        for fr in frames:
            dets = predict(det_params, jnp.asarray(fr.image)[None])
            v = np.asarray(dets.valid[0])
            s = np.asarray(dets.scores[0])
            stats["frames"] += 1
            stats["slots"] += v.size
            stats["nms_valid"] += int(v.sum())
            stats["objectness"] += int((v & (s > c.objectness_thres)).sum())
            iou = np.asarray(box2d_iou_matrix(dets.boxes[0],
                                              jnp.asarray(fr.boxes)))
            iou = np.where(np.asarray(fr.valid)[None, :], iou, -1)
            best2d = iou.max(1)
            stats["iou2d"] += int((v & (best2d >= c.iou2d_thres)).sum())
            samples["scores"].extend(s[v].tolist())
            samples["iou2d"].extend(best2d[v].tolist())
            gt_masks = jnp.asarray(fr.masks[:, :cam.height, :cam.width])
            cropped = crop(jnp.asarray(fr.depth), jnp.asarray(fr.campose),
                           jnp.asarray(fr.boxes3d), jnp.asarray(fr.boxes),
                           gt_masks)
            args = (dets.boxes[0], dets.scores[0], dets.classes[0],
                    dets.valid[0], dets.masks[0], dets.voxels[0],
                    dets.nocs[0], jnp.asarray(fr.boxes),
                    jnp.asarray(fr.valid), jnp.asarray(fr.depth),
                    jnp.asarray(fr.campose), cropped, jax.random.PRNGKey(0))
            frame = pose_fn(*args)
            frame_open = pose_open(*args)
            fv = np.asarray(frame.valid)
            stats["gated"] += int(fv.sum())
            stats["pose_valid"] += int((v & np.asarray(
                frame_open.valid)).sum())
            i3 = np.asarray(box3d_iou_matrix(frame_open.pred_boxes,
                                             jnp.asarray(fr.boxes3d)))
            i3 = np.where(np.asarray(fr.valid)[None, :], i3, -1)
            best3d = i3.max(1)
            stats["iou3d_id"] += int(
                (fv & (best3d >= cfg.tracking.box_iou_thres)).sum())
            samples["iou3d"].extend(best3d[fv].tolist())

    log("[funnel] gate funnel over all test frames:")
    for k, n in stats.items():
        log(f"  {k:>10}: {n}")
    dists = {}
    for name, vals in samples.items():
        if vals:
            a = np.array(vals)
            dists[name] = {"median": float(np.median(a)),
                           "p10": float(np.percentile(a, 10)),
                           "p90": float(np.percentile(a, 90))}
            log(f"  {name}: {dists[name]}")
    return {"stats": stats, "dists": dists}


def combined_mode(cfg, differentiable, det_params):
    from diffpose_study import pose_errors
    from mot3d_tpu.data.detection_loader import load_frame
    from mot3d_tpu.data.motfront import MOTFrontDataset
    from mot3d_tpu.train.combined_trainer import CombinedTrainer

    name = "differentiable" if differentiable else "detached"
    mode_cfg = cfg.replace(
        pose=dataclasses.replace(cfg.pose, differentiable=differentiable),
        combined=dataclasses.replace(cfg.combined, eval_period=10 ** 9,
                                     checkpoint_period=10 ** 9))
    ds = MOTFrontDataset(DATA, "train",
                         voxel_dir=os.path.join(DATA, "voxels"))
    test_ds = MOTFrontDataset(DATA, "test",
                              voxel_dir=os.path.join(DATA, "voxels"))
    trainer = CombinedTrainer(mode_cfg, output_dir=os.path.join(OUT, name))

    t = mode_cfg.combined.batch_size
    cache = {}

    def windows():
        while True:
            for scene in ds.scenes():
                if scene not in cache:
                    cache[scene] = [load_frame(ds, fr, mode_cfg.detection)
                                    for fr in ds.load_scene(scene).frames]
                frames = cache[scene]
                for i in range(0, len(frames) - t + 1, t):
                    yield frames[i:i + t]

    test_seqs = [[load_frame(test_ds, fr, mode_cfg.detection)
                  for fr in test_ds.load_scene(s).frames]
                 for s in test_ds.scenes()]

    t0 = time.time()
    log(f"[{name}] combined training {COMB_ITERS} iters "
        f"(warm-started detector) ...")
    final = trainer.train(windows(), max_iter=COMB_ITERS,
                          det_init_params=det_params)
    log(f"[{name}] trained in {time.time() - t0:.0f}s")

    hist, bad = [], 0
    with open(os.path.join(OUT, name, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            hist.append(rec)
            if any(isinstance(v, float) and not np.isfinite(v)
                   for v in rec.values()):
                bad += 1

    def tail_mean(key, k=50):
        vals = [h[key] for h in hist if key in h][-k:]
        return float(np.mean(vals)) if vals else float("nan")

    def frac_positive(key):
        vals = [h[key] for h in hist if key in h]
        return float(np.mean([v > 0 for v in vals])) if vals else 0.0

    mota = trainer.do_test(test_seqs, classwise=False)
    rot_err, loc_err, n_matched = pose_errors(trainer, test_seqs)
    res = {
        "mode": name,
        "iters": COMB_ITERS,
        "nonfinite_steps": bad,
        "tracking_loss_tail50": tail_mean("tracking_loss"),
        "tracking_loss_frac_positive": frac_positive("tracking_loss"),
        "loss_nocs_tail50": tail_mean("loss_nocs"),
        "detection_total_tail50": tail_mean("detection_total"),
        "mota": float(mota.get("mota", float("nan"))),
        "idf1": float(mota.get("idf1", float("nan"))),
        "precision": float(mota.get("precision", float("nan"))),
        "recall": float(mota.get("recall", float("nan"))),
        "rot_err_deg": rot_err,
        "loc_err_cm": loc_err,
        "pose_matches": n_matched,
    }
    log(f"[{name}] {json.dumps(res, indent=1)}")
    return res


def main():
    log("devices:", require_backend(300.0))
    os.makedirs(OUT, exist_ok=True)
    from mot3d_tpu.config import default_config

    cfg = default_config()
    cfg = cfg.replace(combined=dataclasses.replace(
        cfg.combined, detection_lr=LR))
    summary_path = os.path.join(OUT, "summary.json")
    summary = {}
    if os.path.exists(summary_path):
        with open(summary_path) as f:
            summary = json.load(f)

    def save():
        with open(summary_path, "w") as f:
            json.dump(summary, f, indent=2)

    if "data" in PHASES:
        make_data()
    det_trainer = None
    if "det" in PHASES:
        det_trainer = det_pretrain(cfg)
    if "funnel" in PHASES or "combined" in PHASES:
        if det_trainer is None:
            det_trainer = restore_det(cfg)
        det_params = det_trainer.state.params
    if "funnel" in PHASES:
        summary["funnel"] = funnel(cfg, det_params)
        save()
    if "combined" in PHASES:
        for diff in (False, True):
            key = "differentiable" if diff else "detached"
            summary[key] = combined_mode(cfg, diff, det_params)
            save()
        keys = ["mode", "nonfinite_steps", "tracking_loss_tail50",
                "tracking_loss_frac_positive", "mota", "idf1", "precision",
                "recall", "rot_err_deg", "loc_err_cm", "pose_matches"]
        log("table:")
        log(" | ".join(keys))
        for key in ("detached", "differentiable"):
            r = summary[key]
            log(" | ".join(str(round(r[k], 4)) if isinstance(r[k], float)
                           else str(r[k]) for k in keys))
    save()


if __name__ == "__main__":
    main()
