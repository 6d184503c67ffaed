"""Detection-cap behaviour (VERDICT r3 weak #8 minor).

`detections_per_image` (16) is well below detectron2's
TEST.DETECTIONS_PER_IMAGE default of 100 (`Detection/cfg_setup.py` TEST
defaults).  At MOTFront's <=12 objects/frame the cap is safe for
single-dominant-class score profiles, but cross-class duplicates above the
0.35 objectness gate CAN crowd real objects out, so the cap is pinned two
ways: (a) an ops-level test of exactly when top-k binds, (b) the exporter's
runtime saturation guard (export.py) that warns when every slot is valid
and above the gate — the signature of a binding cap.
"""

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from __graft_entry__ import _tiny_config

from mot3d_tpu.ops.nms import classwise_nms_mask, top_k_by_score


def _dense_frame(n_objects, n_classes=7, dup_classes=1):
    """Well-separated boxes; each object scores >gate on `dup_classes`
    classes (cross-class duplicates survive classwise NMS)."""
    rng = np.random.default_rng(0)
    p = n_objects
    boxes = np.zeros((p, n_classes, 4), np.float32)
    scores = np.full((p, n_classes), 0.01, np.float32)
    valid = np.zeros((p, n_classes), bool)
    for i in range(p):
        x = 10 + 40 * (i % 8)
        y = 10 + 40 * (i // 8)
        boxes[i, :, :] = [x, y, x + 30, y + 30]
        for d in range(dup_classes):
            c = (i + d) % n_classes
            scores[i, c] = 0.9 - 0.02 * i - 0.1 * d
            valid[i, c] = True
    return jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid)


def _kept_above_gate(boxes, scores, valid, k, gate=0.35):
    keep = classwise_nms_mask(boxes, scores, valid, 0.4).reshape(-1)
    flat = scores.reshape(-1)
    idx, ok = top_k_by_score(jnp.where(keep, flat, -jnp.inf), keep, k)
    kept_scores = np.asarray(flat[idx])[np.asarray(ok)]
    return int((kept_scores > gate).sum()), bool(np.asarray(ok).all())


def test_cap_never_binds_at_motfront_density():
    """<=12 objects, one dominant class each: all gated detections fit in
    16 slots with headroom (the shipped configuration is safe)."""
    boxes, scores, valid = _dense_frame(12, dup_classes=1)
    n_gated, saturated = _kept_above_gate(boxes, scores, valid, k=16)
    assert n_gated == 12
    assert not saturated  # free slots remain -> nothing was dropped


def test_cap_binds_on_crossclass_duplicates_and_guard_detects_it():
    """12 objects each scoring above the gate on TWO classes: 24 gated
    candidates overflow 16 slots — and the saturation signature (all slots
    valid + above gate) is exactly what the exporter warns on."""
    boxes, scores, valid = _dense_frame(12, dup_classes=2)
    n_gated, saturated = _kept_above_gate(boxes, scores, valid, k=16)
    assert saturated           # every slot filled...
    assert n_gated == 16       # ...all above the gate: the cap bound
    # Raising the cap (detectron2's remedy: TEST.DETECTIONS_PER_IMAGE=100)
    # recovers every candidate.
    n_gated32, saturated32 = _kept_above_gate(boxes, scores, valid, k=32)
    assert n_gated32 == 24 and not saturated32


def test_exporter_warns_on_saturated_buffer(capsys):
    from mot3d_tpu.config import Config
    from mot3d_tpu.data.detection_loader import DetectionSample
    from mot3d_tpu.export import DetectorExporter
    from mot3d_tpu.models.mask_rcnn import Detections, MaskRCNN

    cfg = _tiny_config()
    det_cfg = cfg.detection
    model = MaskRCNN(det_cfg)
    h = w = det_cfg.pad_height
    m, d = det_cfg.max_instances, det_cfg.detections_per_image
    rng = np.random.default_rng(0)
    sample = DetectionSample(
        image=rng.uniform(0, 255, (h, w, 3)).astype(np.float32),
        depth=rng.uniform(1, 3, (h, w)).astype(np.float32),
        campose=np.eye(4, dtype=np.float32),
        boxes=np.tile([5.0, 5.0, 25.0, 25.0], (m, 1)).astype(np.float32),
        classes=np.zeros(m, np.int32), valid=np.ones(m, bool),
        masks=np.ones((m, h, w), np.float32),
        voxels=(rng.uniform(size=(m, 32, 32, 32)) < 0.3).astype(np.float32),
        nocs=rng.uniform(size=(m, 28, 28, 3)).astype(np.float32),
        boxes3d=rng.normal(size=(m, 8, 3)).astype(np.float32),
        object_ids=np.arange(m, dtype=np.int32),
        locations=np.zeros((m, 3), np.float32),
        rotations=np.zeros((m, 3), np.float32),
        scales3d=np.ones(m, np.float32))
    # Saturated detections: every slot valid, every score above the gate.
    dets = Detections(
        boxes=jnp.tile(jnp.asarray([5.0, 5.0, 25.0, 25.0]), (1, d, 1)),
        scores=jnp.full((1, d), 0.9),
        classes=jnp.zeros((1, d), jnp.int32),
        valid=jnp.ones((1, d), bool),
        masks=jnp.ones((1, d, 28, 28)) * 0.9,
        voxels=jnp.ones((1, d, 32, 32, 32)) * 0.9,
        nocs=jnp.asarray(rng.uniform(size=(1, d, 28, 28, 3)), jnp.float32))

    params = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, h, w, 3)), method=MaskRCNN.predict))(
        jax.random.PRNGKey(0))
    exporter = DetectorExporter(cfg, model, params)
    exporter.export_frame(sample, None, jax.random.PRNGKey(1), dets=dets)
    assert "detection buffer saturated" in capsys.readouterr().out
    # Warn-once: a second saturated frame stays quiet.
    exporter.export_frame(sample, None, jax.random.PRNGKey(2), dets=dets)
    assert "saturated" not in capsys.readouterr().out
