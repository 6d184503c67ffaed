"""NOCS-head learning study (VERDICT r1 item 6).

Round-1 observation: loss_nocs plateaus ~0.13-0.16 after 600 iters on
MOTFront-format fixtures.  tests/test_nocs_loss_oracle.py shows the sampled
overlap loss matches the reference full-canvas computation and has FD-exact
gradients, so this script separates the remaining hypotheses empirically:

  1. target noise floor: the fixture NOCS renders are point-scatter images
     (speckle holes -> white bg via the crop==0 quirk,
     `Detection/utils/train_utils.py:277-297`) and per-crop minmax
     normalisation makes the target crop-dependent; estimate the
     irreducible loss as the smooth-L1 between each GT patch and the
     *other frames'* patches of the same object (the best any
     frame-consistent predictor could do).
  2. regression vs bin-classification (`MODEL.ROI_NOCS_HEAD.USE_BIN_LOSS`,
     `Detection/cfg_setup.py`): train both variants with the same data and
     compare loss curves + mean-abs NOCS error at GT boxes.

Run (TPU): PYTHONPATH=/root/repo python examples/nocs_study.py [--iters 1200]
Writes out/nocs_study/summary.json.
"""

import argparse
import dataclasses
import json
import os
import time

import numpy as np

from mot3d_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from mot3d_tpu.config import Config
from mot3d_tpu.data.detection_loader import (iterate_detection_batches,
                                             load_frame)
from mot3d_tpu.data.fixtures import write_motfront_fixture
from mot3d_tpu.data.motfront import MOTFrontDataset
from mot3d_tpu.train.detection_trainer import DetectionTrainer


def _smooth_l1(x, beta=0.1):
    ax = np.abs(x)
    return np.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def target_consistency_floor(frames_samples):
    """Mean smooth-L1 between GT patches of the SAME object in different
    frames: a predictor that is a pure function of object identity cannot
    beat this; a view-dependent predictor can, so this is an upper bound on
    the floor — but on fixtures (same cube NOCS every view) the patch
    differences are pure rendering/normalisation noise."""
    by_obj = {}
    for s in frames_samples:
        for i in range(s.valid.shape[0]):
            if s.valid[i]:
                by_obj.setdefault(int(s.object_ids[i]), []).append(s.nocs[i])
    losses = []
    for patches in by_obj.values():
        for a in range(len(patches)):
            for b in range(a + 1, len(patches)):
                losses.append(_smooth_l1(patches[a] - patches[b]).mean())
    return float(np.mean(losses)) if losses else float("nan")


def final_nocs_error(trainer, frames_samples, use_bin, num_bins):
    """Mean-abs NOCS error at GT boxes (non-white GT pixels only)."""
    from mot3d_tpu.models.mask_rcnn import MaskRCNN
    from mot3d_tpu.models.nocs_head import nocs_bins_to_values

    model = trainer.model
    fn = jax.jit(lambda p, im, bx, cl: model.apply(
        p, im, bx, cl, method=MaskRCNN.predict_given_boxes))
    errs = []
    for s in frames_samples:
        _, _, nocs_out = fn(trainer.state.params, jnp.asarray(s.image[None]),
                            jnp.asarray(s.boxes[None]),
                            jnp.asarray(s.classes[None]))
        pred = np.asarray(nocs_out[0])  # (M, 28, 28, 3)
        for i in range(s.valid.shape[0]):
            if not s.valid[i]:
                continue
            gt = s.nocs[i]
            fg = np.abs(gt.sum(-1) - 3.0) > 0.05  # non-white
            if fg.sum() == 0:
                continue
            errs.append(np.abs(pred[i][fg] - gt[fg]).mean())
    return float(np.mean(errs))


def run_variant(name, cfg, ds, frames_samples, iters, log_every=100):
    trainer = DetectionTrainer(cfg, output_dir=f"out/nocs_study/{name}")
    batches = iterate_detection_batches(ds, cfg.detection, batch_size=2,
                                        epochs=10_000, seed=0)
    curve = []
    t0 = time.time()
    it = 0
    rng = jax.random.PRNGKey(cfg.run.seed + 2)
    for batch in batches:
        if it >= iters:
            break
        if trainer.state is None:
            trainer.init_state(batch)
        if trainer._step_fn is None:
            trainer._step_fn = trainer._make_step()
        rng, sub = jax.random.split(rng)
        from mot3d_tpu.train.detection_trainer import sample_to_gt
        trainer.state, metrics = trainer._step_fn(
            trainer.state, jnp.asarray(batch.image), sample_to_gt(batch), sub)
        it += 1
        if it % log_every == 0 or it == 1:
            ln = float(metrics["loss_nocs"])
            lt = float(metrics["total"])
            curve.append({"iter": it, "loss_nocs": ln, "total": lt})
            print(f"[{name}] iter {it:5d} loss_nocs {ln:.4f} "
                  f"total {lt:.3f} ({time.time() - t0:.0f}s)", flush=True)
    err = final_nocs_error(trainer, frames_samples,
                           cfg.detection.nocs_use_bin_loss,
                           cfg.detection.nocs_num_bins)
    print(f"[{name}] final mean-abs NOCS error at GT boxes: {err:.4f}")
    return {"curve": curve, "final_nocs_mae": err}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1200)
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--variants", default="regression,bin")
    args = ap.parse_args()

    root = "out/nocs_study/fixtures"
    if not os.path.isdir(os.path.join(root, "train")):
        write_motfront_fixture(root, "train", num_scenes=args.scenes,
                               num_frames=args.frames, num_objects=3, seed=7)
    cfg = Config()
    ds = MOTFrontDataset(root, "train",
                         voxel_dir=os.path.join(root, "voxels"))
    frames_samples = [load_frame(ds, f, cfg.detection)
                      for sc in ds.scenes()
                      for f in ds.load_scene(sc).frames]

    floor = target_consistency_floor(frames_samples)
    print(f"target cross-frame consistency floor (smooth-L1): {floor:.4f}")

    summary_path = "out/nocs_study/summary.json"
    results = {}
    if os.path.isfile(summary_path):
        with open(summary_path) as f:
            results.update(json.load(f))
    # This run's floor wins over any stale value from a previous summary.
    results["consistency_floor"] = floor
    for name, use_bin in (("regression", False), ("bin", True)):
        if name not in args.variants.split(","):
            continue
        det = dataclasses.replace(
            cfg.detection, nocs_use_bin_loss=use_bin,
            nocs_loss_weight=0.2 if use_bin else 3.0)
        results[name] = run_variant(name, cfg.replace(detection=det), ds,
                                    frames_samples, args.iters)
    os.makedirs("out/nocs_study", exist_ok=True)
    with open("out/nocs_study/summary.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: (v if not isinstance(v, dict)
                          else {"final_nocs_mae": v["final_nocs_mae"],
                                "last_loss": v["curve"][-1]})
                      for k, v in results.items()}, indent=2))


if __name__ == "__main__":
    main()
