"""Differentiable-pose end-to-end study (VERDICT r2 weak #5 / next #4).

Trains the combined step on MOTFront-format fixtures twice with the SAME
data, seeds and iteration budget:

  A. detached pose (cfg.pose.differentiable=False — reference parity,
     `Detection/tracker/postprocess.py:151` reshape_nocs.detach());
  B. differentiable pose (True): with the joint single-backward step the
     tracking loss's gradient flows through the MPN, the graph's pose edge
     features, and the RANSAC/Umeyama solver into the NOCS head and
     backbone — the framework's namesake capability
     (`PoseEst/pose_utils.py:16-61` is the solver being differentiated).

Reports, per mode: loss_nocs / tracking_loss trajectories (any NaN/inf
step counts as instability), final do_test MOTA, and mean pose errors
(rotation deg / location cm) of gated detections on the test scenes.
Writes out/diffpose_study/summary.json; paste the table into PARITY.md.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python examples/diffpose_study.py
Env: DPS_ITERS (default 250), DPS_OUT (default out/diffpose_study).
"""

import dataclasses
import json
import os
import sys
import tempfile

import numpy as np

from mot3d_tpu.runtime import enable_compilation_cache, require_backend

enable_compilation_cache()

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def pose_errors(trainer, sequences):
    """Mean rotation (deg) / location (cm) error of gated detections vs GT,
    matched by 2D-IoU best GT (the export-time oracle metric protocol)."""
    from mot3d_tpu.geometry.iou3d import box2d_iou_matrix
    from mot3d_tpu.geometry.transforms import euler_to_rotmat

    predict, pose, _ = trainer._eval_fns()
    rots, locs = [], []
    rng = jax.random.PRNGKey(11)
    from mot3d_tpu.train.combined_trainer import samples_to_combined_window
    for frames in sequences:
        window = samples_to_combined_window(frames)
        dets = predict(trainer.state.det_params, window.images)
        for t in range(len(frames)):
            rng, sub = jax.random.split(rng)
            out = pose(dets.boxes[t], dets.scores[t], dets.classes[t],
                       dets.valid[t], dets.masks[t], dets.voxels[t],
                       dets.nocs[t], window.gt_boxes2d[t],
                       window.gt_valid[t], window.depth[t],
                       window.campose[t], window.gt_boxes3d[t], sub)
            valid = np.asarray(out.valid)
            if not valid.any():
                continue
            iou = np.asarray(box2d_iou_matrix(
                dets.boxes[t], window.gt_boxes2d[t]))
            best = iou.argmax(1)
            gt_locs = frames[t].locations
            gt_rots = frames[t].rotations
            pred_eul = np.asarray(out.rotations)
            pred_loc = np.asarray(out.translations)
            for i in np.where(valid)[0]:
                g = best[i]
                if not frames[t].valid[g]:
                    continue
                r_pred = np.asarray(euler_to_rotmat(jnp.asarray(pred_eul[i])))
                r_gt = np.asarray(euler_to_rotmat(jnp.asarray(
                    gt_rots[g].astype(np.float32))))
                cosang = (np.trace(r_pred.T @ r_gt) - 1) / 2
                rots.append(np.degrees(np.arccos(np.clip(cosang, -1, 1))))
                locs.append(100 * np.linalg.norm(pred_loc[i] - gt_locs[g]))
    return (float(np.mean(rots)) if rots else float("nan"),
            float(np.mean(locs)) if locs else float("nan"),
            len(rots))


def run_mode(differentiable: bool, data_root: str, iters: int, out_dir: str):
    from mot3d_tpu.config import default_config
    from mot3d_tpu.data.detection_loader import load_frame
    from mot3d_tpu.data.motfront import MOTFrontDataset
    from mot3d_tpu.train.combined_trainer import CombinedTrainer

    name = "differentiable" if differentiable else "detached"
    cfg = default_config()
    cfg = cfg.replace(
        pose=dataclasses.replace(cfg.pose, differentiable=differentiable),
        combined=dataclasses.replace(cfg.combined, eval_period=10 ** 9,
                                     checkpoint_period=10 ** 9))
    ds = MOTFrontDataset(data_root, "train",
                         voxel_dir=os.path.join(data_root, "voxels"))
    test_ds = MOTFrontDataset(data_root, "test",
                              voxel_dir=os.path.join(data_root, "voxels"))
    trainer = CombinedTrainer(cfg, output_dir=os.path.join(out_dir, name))

    def windows():
        t = cfg.combined.batch_size
        while True:
            for scene in ds.scenes():
                frames = ds.load_scene(scene).frames
                for i in range(0, len(frames) - t + 1, t):
                    yield [load_frame(ds, fr, cfg.detection)
                           for fr in frames[i:i + t]]

    test_seqs = [[load_frame(test_ds, fr, cfg.detection)
                  for fr in test_ds.load_scene(s).frames]
                 for s in test_ds.scenes()]

    log(f"[{name}] training {iters} iters ...")
    final = trainer.train(windows(), max_iter=iters)

    # Stability: scan the metrics log for non-finite steps.
    bad = 0
    hist = []
    with open(os.path.join(out_dir, name, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            hist.append(rec)
            if any(isinstance(v, float) and not np.isfinite(v)
                   for v in rec.values()):
                bad += 1
    mota = trainer.do_test(test_seqs, classwise=False)
    rot_err, loc_err, n_matched = pose_errors(trainer, test_seqs)

    def tail_mean(key, k=20):
        vals = [h[key] for h in hist if key in h][-k:]
        return float(np.mean(vals)) if vals else float("nan")

    res = {
        "mode": name,
        "iters": iters,
        "nonfinite_steps": bad,
        "loss_nocs_tail20": tail_mean("loss_nocs"),
        "tracking_loss_tail20": tail_mean("tracking_loss"),
        "detection_total_tail20": tail_mean("detection_total"),
        "mota": float(mota.get("mota", float("nan"))),
        "idf1": float(mota.get("idf1", float("nan"))),
        "rot_err_deg": rot_err,
        "loc_err_cm": loc_err,
        "pose_matches": n_matched,
        "final_metrics": final,
    }
    log(f"[{name}] {json.dumps(res, indent=1)}")
    return res


def main():
    iters = int(os.environ.get("DPS_ITERS", "250"))
    out_dir = os.environ.get("DPS_OUT", "out/diffpose_study")
    os.makedirs(out_dir, exist_ok=True)
    log("devices:", require_backend(300.0))

    from mot3d_tpu.data.fixtures import write_motfront_fixture

    data_root = os.path.join(out_dir, "fixture_data")
    if not os.path.exists(os.path.join(data_root, "3D_front_mapping.csv")):
        write_motfront_fixture(data_root, "train", num_scenes=3,
                               num_frames=8, num_objects=3, seed=0)
        write_motfront_fixture(data_root, "test", num_scenes=2,
                               num_frames=6, num_objects=3, seed=100)

    results = [run_mode(False, data_root, iters, out_dir),
               run_mode(True, data_root, iters, out_dir)]
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(results, f, indent=2)
    log("table:")
    keys = ["mode", "nonfinite_steps", "loss_nocs_tail20",
            "tracking_loss_tail20", "mota", "idf1", "rot_err_deg",
            "loc_err_cm", "pose_matches"]
    log(" | ".join(keys))
    for r in results:
        log(" | ".join(str(round(r[k], 4)) if isinstance(r[k], float)
                       else str(r[k]) for k in keys))


if __name__ == "__main__":
    main()
