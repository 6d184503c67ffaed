"""Trainers: tracking (epochs + MOTA val + best ckpt), detection, combined."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mot3d_tpu.config import (CameraConfig, Config, DetectionConfig,
                              PoseConfig, TrackingConfig)
from mot3d_tpu.data.synthetic import synthetic_sequence
from mot3d_tpu.data.synthetic_detection import synthetic_detection_scene
from mot3d_tpu.data.detection_loader import DetectionSample


def tiny_cfg() -> Config:
    det = DetectionConfig(
        pad_height=64, pad_width=64, image_height=64, image_width=64,
        rpn_pre_nms_topk_train=128, rpn_post_nms_topk_train=32,
        rpn_pre_nms_topk_test=64, rpn_post_nms_topk_test=16,
        roi_batch_per_image=16, detections_per_image=4, max_instances=3,
        anchor_sizes=(16, 32, 64, 128, 256), backbone_width=0.25,
        fpn_channels=64, mask_head_width=32, box_head_width=128,
        head_width_mult=0.125, fg_head_buffer=8)
    trk = TrackingConfig(seq_len=6, max_instances_per_frame=4,
                         max_frame_dist=2, batch_size=2)
    cam = CameraConfig(height=64, width=64, fx=64.0, fy=64.0)
    pose = PoseConfig(max_points=128, ransac_iters=16, outlier_min_points=16)
    return Config().replace(detection=det, tracking=trk, camera=cam,
                            pose=pose)


def seq_dicts(cfg, n, seed0=0):
    return [synthetic_sequence(cfg.tracking, seed=seed0 + i, num_objects=3,
                               noise=0.01)._asdict() for i in range(n)]


class TestTrackingTrainer:
    def test_train_improves_and_checkpoints(self, tmp_path):
        from mot3d_tpu.train.tracking_trainer import TrackingTrainer
        cfg = tiny_cfg()
        trainer = TrackingTrainer(cfg, output_dir=str(tmp_path))
        train = seq_dicts(cfg, 4)
        val = seq_dicts(cfg, 2, seed0=100)
        first = trainer.train(train, val, num_epochs=1, batch_size=2)
        assert "mota" in first
        more = trainer.train(train, val, num_epochs=1, batch_size=2)
        assert np.isfinite(more["val_loss"])
        # best-mota checkpoint recorded
        assert "mota" in trainer.ckpt.best
        # restore roundtrip
        restored = trainer.ckpt.restore(trainer.state)
        assert int(restored.step) == int(trainer.state.step)

    def test_inference_prints_classwise(self, tmp_path, capsys):
        import os
        from mot3d_tpu.train.tracking_trainer import TrackingTrainer
        cfg = tiny_cfg()
        trainer = TrackingTrainer(cfg, output_dir=str(tmp_path))
        seqs = seq_dicts(cfg, 2)
        trainer.init_state(None)
        vis = str(tmp_path / "vis")
        result = trainer.inference(seqs, export_dir=vis)
        assert "mota" in result
        assert any(k.startswith("mota_") for k in result)
        # replay + trajectory exports written per sequence
        for si in range(2):
            names = os.listdir(os.path.join(vis, f"seq_{si:03d}"))
            assert "replay.html" in names


class TestDetectionTrainer:
    def test_few_steps(self, tmp_path):
        from mot3d_tpu.train.detection_trainer import DetectionTrainer
        cfg = tiny_cfg()
        scene = synthetic_detection_scene(cfg.detection, batch=2,
                                          num_objects=2, seed=0)

        def to_sample(sc):
            b = sc.images.shape[0]
            z = lambda *s: np.zeros(s, np.float32)
            return DetectionSample(
                image=sc.images, depth=z(b, 64, 64),
                campose=np.tile(np.eye(4, dtype=np.float32), (b, 1, 1)),
                boxes=sc.boxes, classes=sc.classes, valid=sc.valid,
                masks=sc.masks, voxels=sc.voxels, nocs=sc.nocs,
                boxes3d=z(b, cfg.detection.max_instances, 8, 3),
                object_ids=np.zeros((b, cfg.detection.max_instances),
                                    np.int32),
                locations=z(b, cfg.detection.max_instances, 3),
                rotations=z(b, cfg.detection.max_instances, 3),
                scales3d=np.ones((b, cfg.detection.max_instances),
                                 np.float32))

        batch = to_sample(scene)
        trainer = DetectionTrainer(cfg, output_dir=str(tmp_path))
        out = trainer.train(iter([batch, batch, batch]), max_iter=3)
        assert np.isfinite(out["total"])
        val = trainer.evaluate([batch])
        assert np.isfinite(val["val_total"])
        dets = trainer.predict(scene.images)
        assert dets.boxes.shape[0] == 2

    def test_full_eval_includes_voxnocs_and_segm_ap(self, tmp_path):
        """`evaluate(voxnocs=True, ap=True)` mirrors the reference's
        do_test: FrontEvaluator voxel/pose metrics + COCO bbox AND segm AP
        (`Detection/train_net.py:66-90`, `CocoEvaluator.py:32`)."""
        from mot3d_tpu.train.detection_trainer import DetectionTrainer
        cfg = tiny_cfg()
        scene = synthetic_detection_scene(cfg.detection, batch=2,
                                          num_objects=2, seed=0)
        b = scene.images.shape[0]
        m = cfg.detection.max_instances
        rng = np.random.default_rng(0)
        batch = DetectionSample(
            image=scene.images,
            depth=rng.uniform(1.0, 3.0, (b, 64, 64)).astype(np.float32),
            campose=np.tile(np.eye(4, dtype=np.float32), (b, 1, 1)),
            boxes=scene.boxes, classes=scene.classes, valid=scene.valid,
            masks=scene.masks, voxels=scene.voxels, nocs=scene.nocs,
            boxes3d=rng.normal(size=(b, m, 8, 3)).astype(np.float32),
            object_ids=np.zeros((b, m), np.int32),
            locations=np.zeros((b, m, 3), np.float32),
            rotations=np.zeros((b, m, 3), np.float32),
            scales3d=np.ones((b, m), np.float32))
        trainer = DetectionTrainer(cfg, output_dir=str(tmp_path))
        trainer.train(iter([batch]), max_iter=1)
        out = trainer.evaluate([batch], voxnocs=True, ap=True)
        assert np.isfinite(out["val_total"])
        assert any(k.startswith("bbox/") for k in out)
        assert any(k.startswith("segm/") for k in out)
        # Untrained detector: voxnocs eval runs and returns a (possibly
        # empty) per-class dict without crashing; values, when present,
        # must be finite.
        for k, v in out.items():
            assert np.isfinite(v), (k, v)


class TestCombinedTrainer:
    def test_one_step_and_do_test(self, tmp_path):
        from mot3d_tpu.train.combined_trainer import CombinedTrainer
        cfg = tiny_cfg()
        cfg = cfg.replace(combined=dataclasses.replace(
            cfg.combined, batch_size=2))
        trainer = CombinedTrainer(cfg, output_dir=str(tmp_path))

        scene = synthetic_detection_scene(cfg.detection, batch=1,
                                          num_objects=2, seed=0)
        rng = np.random.default_rng(0)

        def frame(seed):
            sc = synthetic_detection_scene(cfg.detection, batch=1,
                                           num_objects=2, seed=seed)
            M = cfg.detection.max_instances
            return DetectionSample(
                image=sc.images[0],
                depth=rng.uniform(1, 3, (64, 64)).astype(np.float32),
                campose=np.eye(4, dtype=np.float32),
                boxes=sc.boxes[0], classes=sc.classes[0], valid=sc.valid[0],
                masks=sc.masks[0], voxels=sc.voxels[0], nocs=sc.nocs[0],
                boxes3d=rng.normal(size=(M, 8, 3)).astype(np.float32),
                object_ids=np.arange(M, dtype=np.int32),
                locations=rng.normal(size=(M, 3)).astype(np.float32),
                rotations=np.zeros((M, 3), np.float32),
                scales3d=np.ones((M,), np.float32))

        windows = [[frame(1), frame(2)]]
        out = trainer.train(iter(windows), max_iter=1)
        assert np.isfinite(out["detection_total"])
        assert int(trainer.state.step) == 1

        seq = [frame(i) for i in range(cfg.tracking.seq_len)]
        res = trainer.do_test([seq], classwise=False)
        assert "mota" in res and np.isfinite(res["mota"])

    def test_detector_warm_start(self, tmp_path):
        """init_state(det_params=...) adopts the given pretrained detector
        verbatim — the reference's combined training starts from the trained
        best_model.pth (`Detection/cfg_setup.py:137`), not random init."""
        from mot3d_tpu.models.mask_rcnn import MaskRCNN
        from mot3d_tpu.train.combined_trainer import (CombinedTrainer,
                                                      samples_to_combined_window)
        cfg = tiny_cfg()
        cfg = cfg.replace(combined=dataclasses.replace(
            cfg.combined, batch_size=2))
        trainer = CombinedTrainer(cfg, output_dir=str(tmp_path))
        rng = np.random.default_rng(0)

        def frame(seed):
            sc = synthetic_detection_scene(cfg.detection, batch=1,
                                           num_objects=2, seed=seed)
            M = cfg.detection.max_instances
            return DetectionSample(
                image=sc.images[0],
                depth=rng.uniform(1, 3, (64, 64)).astype(np.float32),
                campose=np.eye(4, dtype=np.float32),
                boxes=sc.boxes[0], classes=sc.classes[0], valid=sc.valid[0],
                masks=sc.masks[0], voxels=sc.voxels[0], nocs=sc.nocs[0],
                boxes3d=rng.normal(size=(M, 8, 3)).astype(np.float32),
                object_ids=np.arange(M, dtype=np.int32),
                locations=rng.normal(size=(M, 3)).astype(np.float32),
                rotations=np.zeros((M, 3), np.float32),
                scales3d=np.ones((M,), np.float32))

        model = MaskRCNN(cfg.detection)
        pre = jax.jit(lambda k: model.init(
            k, jnp.zeros((1, 64, 64, 3)), method=MaskRCNN.predict))(
                jax.random.PRNGKey(1234))
        window = samples_to_combined_window([frame(1), frame(2)])
        state = trainer.init_state(window, det_params=pre)
        same = jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, b: jnp.array_equal(a, b), state.det_params, pre))
        assert same
