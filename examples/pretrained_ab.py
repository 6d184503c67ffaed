"""Pretrained-start A/B (VERDICT r4 next #4): does a COCO-zoo-style
backbone-only partial import actually help training?

The reference trains from model-zoo Mask R-CNN weights
(`Detection/cfg_setup.py:21` merge_from_file(model_zoo...) +
MODEL.WEIGHTS).  Real COCO weights aren't downloadable here (zero egress),
so the A/B exercises the exact protocol machinery on in-environment
weights:

  1. DONOR: train a detector (torch-parity config: affine norms, full
     widths — importers.torch_ckpt.import_config) on fixture set A;
  2. export its BACKBONE ONLY to a detectron2-format state_dict
     (importers.torch_export, sections=("backbone",)) — the shape of a
     zoo checkpoint consumed partially;
  3. STUDENT A: import_detectron2_maskrcnn(strict=False, init_params=
     fresh) -> pretrained backbone + fresh heads; STUDENT B: fresh init.
     Train both on DISJOINT fixture set B for equal iterations;
  4. report train/val loss + funnel objectness counts for both.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python
           examples/pretrained_ab.py
Env: PAB_OUT (out/pretrained_ab), PAB_DONOR_ITERS (3000),
     PAB_STUDENT_ITERS (1200), PAB_DONOR_SCENES (32), PAB_STUDENT_SCENES
     (12).
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


OUT = os.environ.get("PAB_OUT", "out/pretrained_ab")
DONOR_ITERS = int(os.environ.get("PAB_DONOR_ITERS", "3000"))
STUDENT_ITERS = int(os.environ.get("PAB_STUDENT_ITERS", "1200"))
DONOR_SCENES = int(os.environ.get("PAB_DONOR_SCENES", "32"))
STUDENT_SCENES = int(os.environ.get("PAB_STUDENT_SCENES", "12"))


def make_cfg():
    from mot3d_tpu.config import default_config
    from mot3d_tpu.importers.torch_ckpt import import_config
    cfg = default_config()
    return cfg.replace(detection=import_config(cfg.detection))


def make_data(root, scenes, seed, frames=10):
    from mot3d_tpu.data.fixtures import write_motfront_fixture
    if not os.path.exists(os.path.join(root, "3D_front_mapping.csv")):
        write_motfront_fixture(root, "train", num_scenes=scenes,
                               num_frames=frames, num_objects=3, seed=seed)
        write_motfront_fixture(root, "test", num_scenes=max(2, scenes // 8),
                               num_frames=frames, num_objects=3,
                               seed=seed + 10000)


def train_one(cfg, data_root, out_dir, iters, init_params=None,
              resume=False):
    from mot3d_tpu.data.detection_loader import iterate_detection_batches
    from mot3d_tpu.data.motfront import MOTFrontDataset
    from mot3d_tpu.train.detection_trainer import DetectionTrainer

    ds = MOTFrontDataset(data_root, "train",
                         voxel_dir=os.path.join(data_root, "voxels"))
    trainer = DetectionTrainer(cfg, output_dir=out_dir)
    n = sum(len(ds.load_scene(s).frames) for s in ds.scenes())
    batches = iterate_detection_batches(
        ds, cfg.detection, cfg.combined.batch_size, epochs=10 ** 6,
        cache_samples=n, seed=2)
    t0 = time.time()
    final = trainer.train(batches, None, max_iter=iters, resume=resume,
                          init_params=init_params)
    log(f"[{os.path.basename(out_dir)}] {iters} iters in "
        f"{time.time() - t0:.0f}s: total={final.get('total', float('nan')):.4f}")
    trainer.ckpt.save(int(trainer.state.step), trainer.state)
    return trainer, final


def val_losses(trainer, data_root):
    from mot3d_tpu.data.detection_loader import iterate_detection_batches
    from mot3d_tpu.data.motfront import MOTFrontDataset
    test_ds = MOTFrontDataset(data_root, "test",
                              voxel_dir=os.path.join(data_root, "voxels"))
    batches = list(iterate_detection_batches(
        test_ds, trainer.cfg.detection, trainer.cfg.combined.batch_size,
        shuffle=False))
    return trainer.evaluate(batches, voxnocs=False, ap=True)


def main():
    log("devices:", require_backend(300.0))
    os.makedirs(OUT, exist_ok=True)
    cfg = make_cfg()

    donor_root = os.path.join(OUT, "data_donor")
    student_root = os.path.join(OUT, "data_student")
    make_data(donor_root, DONOR_SCENES, seed=20)
    make_data(student_root, STUDENT_SCENES, seed=999)

    # 1. Donor training (resumable).
    donor, _ = train_one(cfg, donor_root, os.path.join(OUT, "donor"),
                         DONOR_ITERS, resume=True)

    # 2. Backbone-only export -> torch-format interchange.
    from mot3d_tpu.importers.torch_ckpt import import_detectron2_maskrcnn
    from mot3d_tpu.importers.torch_export import export_detectron2_maskrcnn
    sd = export_detectron2_maskrcnn(donor.state.params, cfg.detection,
                                    sections=("backbone",))
    log(f"[export] backbone-only state_dict: {len(sd)} tensors")

    # 3. Fresh init for the student config (also the strict=False filler).
    from mot3d_tpu.data.detection_loader import iterate_detection_batches
    from mot3d_tpu.data.motfront import MOTFrontDataset
    from mot3d_tpu.train.detection_trainer import DetectionTrainer
    sds = MOTFrontDataset(student_root, "train",
                          voxel_dir=os.path.join(student_root, "voxels"))
    probe = next(iterate_detection_batches(sds, cfg.detection,
                                           cfg.combined.batch_size,
                                           shuffle=False))
    fresh = DetectionTrainer(cfg, output_dir=os.path.join(OUT, "tmp_init"))
    fresh.init_state(probe)
    fresh_params = fresh.state.params

    imported = import_detectron2_maskrcnn(sd, cfg.detection,
                                          init_params=fresh_params,
                                          strict=False)

    results = {}
    for name, init in (("pretrained", imported), ("scratch", fresh_params)):
        trainer, final = train_one(
            cfg, student_root, os.path.join(OUT, f"student_{name}"),
            STUDENT_ITERS, init_params=init)
        val = val_losses(trainer, student_root)
        import quality_campaign as qc
        qc.DATA = student_root
        fun = qc.funnel(trainer.cfg, trainer.state.params)
        results[name] = {
            "final_train": final,
            "val": {k: float(v) for k, v in val.items()},
            "funnel": fun["stats"],
            "score_median": fun["dists"].get("scores", {}).get("median"),
        }
        with open(os.path.join(OUT, "summary.json"), "w") as f:
            json.dump(results, f, indent=2)

    log("A/B table (student set, equal iterations):")
    keys = ("val_total", "val_loss_cls", "val_loss_nocs", "val_loss_voxel")
    hdr = ["variant"] + list(keys) + ["bbox_AP", "objectness_pass",
                                      "score_median"]
    log(" | ".join(hdr))
    for name, r in results.items():
        row = [name] + [f"{r['val'].get(k, float('nan')):.4f}" for k in keys]
        row.append(f"{r['val'].get('bbox/AP', float('nan')):.4f}")
        row.append(str(r["funnel"]["objectness"]))
        row.append(f"{r['score_median']:.3f}" if r["score_median"] else "-")
        log(" | ".join(row))


if __name__ == "__main__":
    main()
