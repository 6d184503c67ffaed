"""Minimal repro hunt for the remat+B=2 combined-step compiler crash
(VERDICT r3 weak #6 / next #8).

Round 3 observed: the combined train step with remat=True (jax.checkpoint
per window), B=2 windows, full MOTFront resolution crashes the REMOTE TPU
compile helper (HTTP 500, tpu_compile_helper exit 1) for both gradient
structures, while B=1 compiles and the accum_windows workaround runs
275 ms/step.  This script bisects the failing program along three axes —
image resolution, windows-per-batch, remat on/off — smallest first, so the
log localises the smallest crashing configuration and whether remat is
load-bearing for the crash.

Each attempt runs in a SUBPROCESS: the crash kills the backend connection,
and attempts must not poison each other.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python examples/remat_crash_repro.py
Env: RCR_CASES to override, e.g. "128:2:1,256:2:1" (res:B:remat).
"""

import os
import subprocess
import sys
import time

WORKER = r"""
import dataclasses, os, sys
from mot3d_tpu.runtime import enable_compilation_cache, require_backend
enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np, optax
from mot3d_tpu.config import default_config
from mot3d_tpu.models.mask_rcnn import GroundTruth, MaskRCNN
from mot3d_tpu.models.mpn import TrackerModel
from mot3d_tpu.parallel.train_step import (CombinedBatch, CombinedTrainState,
                                           make_combined_train_step)
from mot3d_tpu.tracking.graph_builder import make_template

res, b_windows, remat = (int(sys.argv[1]), int(sys.argv[2]),
                         bool(int(sys.argv[3])))
require_backend(240.0)
cfg = default_config()
scale = res / cfg.detection.pad_height
det = dataclasses.replace(
    cfg.detection, compute_dtype="bfloat16",
    pad_height=res, pad_width=int(cfg.detection.pad_width * scale) // 32 * 32,
    image_height=res, image_width=int(cfg.detection.image_width * scale))
cfg = cfg.replace(detection=det,
                  tracking=dataclasses.replace(cfg.tracking, seq_len=2))
det_model = MaskRCNN(det)
trk_model = TrackerModel(cfg.graph)
template = make_template(2, det.detections_per_image,
                         cfg.tracking.max_frame_dist)
B, T, M = b_windows, 2, det.max_instances
H, W = det.pad_height, det.pad_width
r = np.random.default_rng(0)
boxes = np.zeros((B, T, M, 4), np.float32); boxes[..., 2:] = 40.0
batch = CombinedBatch(
    images=jnp.asarray(r.uniform(0, 255, (B, T, H, W, 3)), jnp.float32),
    depth=jnp.asarray(r.uniform(1, 3, (B, T, cfg.camera.height,
                                       cfg.camera.width)), jnp.float32),
    campose=jnp.tile(jnp.eye(4), (B, T, 1, 1)),
    gt_boxes2d=jnp.asarray(boxes),
    gt_classes=jnp.zeros((B, T, M), jnp.int32),
    gt_valid=jnp.ones((B, T, M), bool),
    gt_masks=jnp.ones((B, T, M, H, W), jnp.float32),
    gt_voxels=jnp.asarray(r.uniform(size=(B, T, M, 32, 32, 32)) < 0.3,
                          jnp.float32),
    gt_nocs=jnp.asarray(r.uniform(size=(B, T, M, 28, 28, 3)), jnp.float32),
    gt_boxes3d=jnp.asarray(r.normal(size=(B, T, M, 8, 3)), jnp.float32),
    gt_ids=jnp.tile(jnp.arange(M, dtype=jnp.int32), (B, T, 1)))
gt0 = GroundTruth(boxes=batch.gt_boxes2d[0], classes=batch.gt_classes[0],
                  valid=batch.gt_valid[0], masks=batch.gt_masks[0],
                  voxels=batch.gt_voxels[0], nocs=batch.gt_nocs[0])
det_params = jax.jit(lambda k1, k2: det_model.init(
    {"params": k1}, batch.images[0], gt0, k2,
    method=MaskRCNN.train_losses))(jax.random.PRNGKey(0), jax.random.PRNGKey(1))
n_nodes = 2 * det.detections_per_image
e2 = len(template.src_frame) * 2
trk_params = jax.jit(lambda k: trk_model.init(
    k, jnp.zeros((n_nodes, 32, 32, 32)), jnp.zeros(e2, jnp.int32),
    jnp.zeros(e2, jnp.int32), jnp.zeros((e2, 8)),
    jnp.zeros(e2, bool)))(jax.random.PRNGKey(2))
opt = optax.adamw(1e-4)
state = CombinedTrainState(det_params, opt.init(det_params), trk_params,
                           opt.init(trk_params), jnp.zeros((), jnp.int32))
step = jax.jit(make_combined_train_step(
    det_model, trk_model, template, cfg, opt, opt,
    joint_grad=True, remat=remat, accum_windows=False))
out = step(state, batch, jax.random.PRNGKey(3))
print("OK", float(out[1]["detection_total"]))
"""


def main():
    cases_env = os.environ.get("RCR_CASES")
    if cases_env:
        cases = [tuple(int(x) for x in c.split(":"))
                 for c in cases_env.split(",")]
    else:
        cases = [
            (128, 2, 1),   # half-res, remat: does shape drive the crash?
            (192, 2, 1),
            (256, 2, 0),   # full-res no remat: is remat load-bearing?
            (256, 2, 1),   # the round-3 crasher
        ]
    results = []
    for res, b, remat in cases:
        tag = f"res{res} B{b} remat{remat}"
        print(f"--- {tag}", flush=True)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-c", WORKER, str(res), str(b), str(remat)],
            capture_output=True, text=True, timeout=2400)
        dt = time.time() - t0
        ok = proc.returncode == 0 and "OK" in proc.stdout
        tail = (proc.stdout + proc.stderr).strip().splitlines()[-3:]
        results.append((tag, ok, dt, tail))
        print(f"    {'OK' if ok else 'CRASH/FAIL'} in {dt:.0f}s; "
              f"tail: {' | '.join(tail)}", flush=True)
    print("\nsummary:")
    for tag, ok, dt, _ in results:
        print(f"  {tag:>22}: {'ok' if ok else 'FAIL'} ({dt:.0f}s)")


if __name__ == "__main__":
    main()
