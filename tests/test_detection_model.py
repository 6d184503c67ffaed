"""Mask R-CNN + NOCS/voxel heads: shapes, losses, gradients, inference."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mot3d_tpu.config import DetectionConfig
from mot3d_tpu.data.synthetic_detection import synthetic_detection_scene
from mot3d_tpu.models.mask_rcnn import (GroundTruth, MaskRCNN, sample_rois)
from mot3d_tpu.models.rpn import (decode_deltas, encode_deltas,
                                  generate_anchors, label_anchors,
                                  subsample_labels)
from mot3d_tpu.models.voxel_head import voxel_loss
from mot3d_tpu.models.nocs_head import nocs_loss, nocs_sample_loss

# Tiny config so the CPU test is fast.
DCFG = DetectionConfig(
    pad_height=64, pad_width=64, image_height=64, image_width=64,
    rpn_pre_nms_topk_train=200, rpn_post_nms_topk_train=64,
    rpn_pre_nms_topk_test=100, rpn_post_nms_topk_test=32,
    roi_batch_per_image=32, detections_per_image=8, max_instances=4,
    anchor_sizes=(16, 32, 64, 128, 256),
    backbone_width=0.25, fpn_channels=64, mask_head_width=32,
    box_head_width=128, head_width_mult=0.125, fg_head_buffer=8,
)


def make_gt(scene):
    return GroundTruth(
        boxes=jnp.array(scene.boxes), classes=jnp.array(scene.classes),
        valid=jnp.array(scene.valid), masks=jnp.array(scene.masks),
        voxels=jnp.array(scene.voxels), nocs=jnp.array(scene.nocs))


@pytest.fixture(scope="module")
def model_and_params():
    scene = synthetic_detection_scene(DCFG, batch=1, num_objects=2)
    model = MaskRCNN(DCFG)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.array(scene.images), make_gt(scene), jax.random.PRNGKey(1),
        method=MaskRCNN.train_losses)
    return model, params


class TestBoxCoding:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        anchors = jnp.array(rng.uniform(0, 50, (10, 4)).astype(np.float32))
        anchors = anchors.at[:, 2:].set(anchors[:, :2] + 10)
        boxes = anchors + jnp.array(rng.uniform(-3, 3, (10, 4)), jnp.float32)
        deltas = encode_deltas(anchors, boxes)
        back = decode_deltas(anchors, deltas)
        np.testing.assert_allclose(np.asarray(back), np.asarray(boxes),
                                   atol=1e-3)


class TestAnchors:
    def test_counts_and_level_structure(self):
        a = generate_anchors(64, 64, (16, 32, 64, 128, 256), (0.5, 1.0, 2.0))
        expect = sum((64 // s) * (64 // s) * 3 for s in (4, 8, 16, 32, 64))
        assert a.shape == (expect, 4)

    def test_labeling(self):
        anchors = jnp.array([[0, 0, 10, 10], [20, 20, 40, 40],
                             [100, 100, 110, 110]], jnp.float32)
        gt = jnp.array([[0, 0, 10, 10]], jnp.float32)
        tgt = label_anchors(anchors, gt, jnp.array([True]), 0.7, 0.3)
        labels = np.asarray(tgt.labels)
        assert labels[0] == 1 and labels[1] == 0 and labels[2] == 0

    def test_best_anchor_forced_positive(self):
        anchors = jnp.array([[0, 0, 8, 8], [50, 50, 60, 60]], jnp.float32)
        gt = jnp.array([[0, 0, 20, 20]], jnp.float32)  # IoU 0.16 < 0.7
        tgt = label_anchors(anchors, gt, jnp.array([True]), 0.7, 0.3)
        assert np.asarray(tgt.labels)[0] == 1

    def test_subsample_counts(self):
        labels = jnp.array([1] * 10 + [0] * 100 + [-1] * 20)
        pos, neg = subsample_labels(labels, jax.random.PRNGKey(0), 32, 0.25)
        assert int(pos.sum()) == 8
        assert int(neg.sum()) == 24
        assert not np.asarray(pos)[120:].any()


class TestSampleRois:
    def test_gt_boxes_become_positives(self):
        scene = synthetic_detection_scene(DCFG, batch=1, num_objects=2)
        props = jnp.array(np.random.default_rng(0).uniform(
            0, 60, (16, 4)).astype(np.float32))
        props = props.at[:, 2:].set(props[:, :2] + 5)
        s = sample_rois(props, jnp.ones(16, bool),
                        jnp.array(scene.boxes[0]),
                        jnp.array(scene.classes[0]),
                        jnp.array(scene.valid[0]),
                        jax.random.PRNGKey(0), DCFG)
        assert s.boxes.shape == (min(DCFG.roi_batch_per_image, 16 + 4), 4)
        # The appended GT boxes match themselves with IoU 1 -> positives exist.
        assert int(s.is_pos.sum()) >= 2


class TestHeadLosses:
    def test_voxel_loss_perfect_prediction_small(self):
        gt = (np.random.default_rng(0).uniform(size=(4, 32, 32, 32)) < 0.3)
        gt = jnp.array(gt, jnp.float32)
        logits = jnp.where(gt > 0, 20.0, -20.0)
        loss, iou = voxel_loss(logits, gt, jnp.ones(4))
        assert float(loss) < 1e-4
        assert float(iou) == 1.0

    def test_voxel_loss_weights_exclude(self):
        gt = jnp.ones((2, 32, 32, 32))
        logits = jnp.stack([jnp.full((32, 32, 32), 20.0),
                            jnp.full((32, 32, 32), -20.0)])
        loss_sel, _ = voxel_loss(logits, gt, jnp.array([1.0, 0.0]))
        assert float(loss_sel) < 1e-4  # bad instance masked out

    def test_nocs_loss_zero_for_perfect(self):
        patch = jnp.tile(jnp.linspace(0.2, 0.8, 28)[None, :, None],
                         (28, 1, 3))
        box = jnp.array([10.0, 10.0, 38.0, 38.0])
        loss, valid = nocs_sample_loss(patch, patch, box, box,
                                       jnp.asarray(False))
        assert bool(valid)
        assert float(loss) < 1e-6

    def test_nocs_symmetry_picks_minimum(self):
        # GT rotated 180 about Y: x' = 1-x (for z=0.5 template), loss should
        # pick the rotated branch for symmetric classes.
        ramp = jnp.linspace(0.1, 0.9, 28)
        pred = jnp.stack([jnp.tile(ramp, (28, 1)),
                          jnp.full((28, 28), 0.5),
                          jnp.full((28, 28), 0.5)], -1)
        gt = jnp.stack([jnp.tile(1.0 - ramp, (28, 1)),
                        jnp.full((28, 28), 0.5),
                        jnp.full((28, 28), 0.5)], -1)
        box = jnp.array([0.0, 0.0, 28.0, 28.0])
        l_nonsym, _ = nocs_sample_loss(pred, gt, box, box, jnp.asarray(False))
        l_sym, _ = nocs_sample_loss(pred, gt, box, box, jnp.asarray(True))
        assert float(l_sym) < 0.01
        assert float(l_nonsym) > 0.1


class TestMaskRCNN:
    def test_train_losses_finite(self, model_and_params):
        model, params = model_and_params
        scene = synthetic_detection_scene(DCFG, batch=1, num_objects=2,
                                          seed=3)
        losses = model.apply(params, jnp.array(scene.images), make_gt(scene),
                             jax.random.PRNGKey(2),
                             method=MaskRCNN.train_losses)
        expected = {"loss_rpn_cls", "loss_rpn_loc", "loss_cls",
                    "loss_box_reg", "loss_mask", "loss_voxel", "loss_nocs"}
        assert expected <= set(losses)
        for k, v in losses.items():
            assert np.isfinite(float(v)), k

    def test_gradients_flow_to_all_heads(self, model_and_params):
        model, params = model_and_params
        scene = synthetic_detection_scene(DCFG, batch=1, num_objects=2,
                                          seed=4)

        def total(p):
            losses = model.apply(p, jnp.array(scene.images), make_gt(scene),
                                 jax.random.PRNGKey(2),
                                 method=MaskRCNN.train_losses)
            return sum(v for k, v in losses.items() if k.startswith("loss"))

        grads = jax.grad(total)(params)
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        by_head = {}
        for path, leaf in flat:
            head = path[1].key if len(path) > 1 else "?"
            by_head.setdefault(head, 0.0)
            by_head[head] += float(np.abs(np.asarray(leaf)).sum())
        for head in ("backbone", "rpn_head", "box_head", "mask_head",
                     "voxel_head", "nocs_head"):
            assert by_head.get(head, 0.0) > 0, f"no gradient into {head}"

    def test_predict_shapes(self, model_and_params):
        model, params = model_and_params
        scene = synthetic_detection_scene(DCFG, batch=2, num_objects=2,
                                          seed=5)
        dets = model.apply(params, jnp.array(scene.images),
                           method=MaskRCNN.predict)
        d = DCFG.detections_per_image
        assert dets.boxes.shape == (2, d, 4)
        assert dets.scores.shape == (2, d)
        assert dets.masks.shape == (2, d, 28, 28)
        assert dets.voxels.shape == (2, d, 32, 32, 32)
        assert dets.nocs.shape == (2, d, 28, 28, 3)
        assert np.isfinite(np.asarray(dets.boxes)).all()

    def test_predict_scan_matches_unroll(self, model_and_params):
        """cfg.predict_mode="scan" (lax.map chain) must reproduce the
        unrolled layout — same single-image ops, same flat gathers, only
        the batching of the traced HLO differs."""
        model, params = model_and_params
        scene = synthetic_detection_scene(DCFG, batch=3, num_objects=2,
                                          seed=7)
        images = jnp.array(scene.images)
        ref = model.apply(params, images, method=MaskRCNN.predict)
        scan_model = MaskRCNN(dataclasses.replace(DCFG,
                                                  predict_mode="scan"))
        got = scan_model.apply(params, images, method=MaskRCNN.predict)
        # valid/classes can legitimately flip on a detection whose score
        # sits at score_thresh_test or an NMS IoU tie (the two layouts
        # reassociate the score arithmetic differently), so require
        # overwhelming agreement rather than exactness (ADVICE r3).
        v_ref = np.asarray(ref.valid)
        v_got = np.asarray(got.valid)
        assert (v_got == v_ref).mean() >= 0.99, (v_got, v_ref)
        both = v_got & v_ref
        c_ref = np.asarray(ref.classes)[both]
        c_got = np.asarray(got.classes)[both]
        assert (c_got == c_ref).mean() >= 0.99, (c_got, c_ref)
        for name in ("boxes", "scores", "masks", "voxels", "nocs"):
            a = np.asarray(getattr(got, name), np.float32)[both]
            b = np.asarray(getattr(ref, name), np.float32)[both]
            np.testing.assert_allclose(a, b, atol=2e-2, rtol=2e-2,
                                       err_msg=name)

    def test_predict_given_boxes(self, model_and_params):
        model, params = model_and_params
        scene = synthetic_detection_scene(DCFG, batch=1, num_objects=2,
                                          seed=6)
        boxes = jnp.array(scene.boxes[:, :3])
        classes = jnp.array(scene.classes[:, :3])
        masks, voxels, nocs = model.apply(
            params, jnp.array(scene.images), boxes, classes,
            method=MaskRCNN.predict_given_boxes)
        assert masks.shape == (1, 3, 28, 28)
        assert voxels.shape == (1, 3, 32, 32, 32)
        assert nocs.shape == (1, 3, 28, 28, 3)
