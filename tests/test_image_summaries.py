"""Image summaries: voxel renders, NOCS panels, PNG+tensorboard writer
(the reference's FrontEvaluator tensorboard put_image calls,
`Detection/evaluator/FrontEvaluator.py:293-333,442-452`)."""

import os

import numpy as np

from mot3d_tpu.train.image_summaries import (ImageWriter, render_nocs_panel,
                                             render_voxel_views)


def test_render_voxel_views_shapes_and_shading():
    g = np.zeros((32, 32, 32))
    g[4:10, 4:10, 4:10] = 1
    img = render_voxel_views(g, g)
    # 2 rows (pred, gt) x 3 views, upscaled 4x.
    assert img.shape == (2 * 32 * 4, 3 * 32 * 4, 3)
    assert img.dtype == np.uint8
    assert img.max() > 100  # occupied cells render bright
    # pred row is red-dominant, gt row green-dominant
    top, bottom = img[:128], img[128:]
    assert top[..., 0].sum() > top[..., 1].sum()
    assert bottom[..., 1].sum() > bottom[..., 0].sum()
    # nearer cells brighter than farther ones (depth shading): the top view
    # looks along axis 0; cells at index 4 are the nearest layer.
    empty = render_voxel_views(np.zeros((32, 32, 32)))
    assert empty.max() == 0


def test_render_nocs_panel():
    pred = np.random.default_rng(0).uniform(0, 1, (28, 28, 3))
    gt = np.random.default_rng(1).uniform(0, 1, (28, 28, 3))
    img = render_nocs_panel(pred, gt)
    assert img.shape == (28 * 6, (28 + 2 + 28) * 6, 3)
    assert img.dtype == np.uint8
    solo = render_nocs_panel(pred)
    assert solo.shape == (28 * 6, 28 * 6, 3)


def test_image_writer_writes_png_and_tb(tmp_path):
    w = ImageWriter(str(tmp_path))
    img = np.zeros((16, 16, 3), np.uint8)
    img[4:12, 4:12] = 200
    p = w.write_image(7, "voxels/inst0", img)
    assert os.path.isfile(p) and p.endswith("_0000007.png")
    import cv2
    back = cv2.imread(p)[:, :, ::-1]
    np.testing.assert_array_equal(back, img)
    # tensorboard events mirrored when the package is available
    try:
        import tensorboard  # noqa: F401
        tb_files = os.listdir(os.path.join(str(tmp_path), "tb"))
        assert any("tfevents" in f for f in tb_files)
    except ImportError:
        pass
    w.close()


def test_render_class_bars():
    from mot3d_tpu.train.image_summaries import render_class_bars
    img = render_class_bars({"chair": 0.8, "table": 0.5, "sofa": 0.9},
                            title="bbox AP per class", ylabel="AP")
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3
    assert img.shape[0] > 100 and img.shape[1] > 100


def test_render_histogram():
    from mot3d_tpu.train.image_summaries import render_histogram
    img = render_histogram([1.0, 2.0, 2.5, 8.0], "rot_err", "deg")
    assert img.dtype == np.uint8 and img.ndim == 3
    empty = render_histogram([], "rot_err", "deg")
    assert empty.dtype == np.uint8


def test_chart_summaries_include_histograms(tmp_path):
    """When the exporter has raw per-instance metrics from a voxnocs eval,
    write_chart_summaries also renders pooled error histograms."""
    from mot3d_tpu.config import Config
    from mot3d_tpu.train.detection_trainer import DetectionTrainer

    class FakeExporter:
        last_raw_metrics = {
            "chair": {"voxel_iou": [0.9], "rot_err": [3.0, 5.0],
                      "loc_err": [0.04, 0.1]},
            "sofa": {"voxel_iou": [0.8], "rot_err": [9.0],
                     "loc_err": [0.2]},
        }

    trainer = DetectionTrainer(Config(), output_dir=str(tmp_path))
    trainer._exporter = FakeExporter()
    paths = trainer.write_chart_summaries({"chair/rot_err_median": 4.0},
                                          step=1)
    names = {os.path.basename(p) for p in paths}
    assert any(n.startswith("hist_rot_err") for n in names)
    assert any(n.startswith("hist_loc_err") for n in names)


def test_chart_summaries_from_metric_dict(tmp_path):
    """write_chart_summaries turns eval metric keys (bbox/AP/<cls>,
    <class>/rot_err_median, ...) into per-class chart PNGs without running
    a model."""
    from mot3d_tpu.config import Config
    from mot3d_tpu.train.detection_trainer import DetectionTrainer
    trainer = DetectionTrainer(Config(), output_dir=str(tmp_path))
    metrics = {
        "bbox/AP": 0.5, "bbox/AP/class_0": 0.6, "bbox/AP/class_1": 0.4,
        "segm/AP/class_0": 0.55,
        "chair/rot_err_median": 4.2, "table/rot_err_median": 6.0,
        "chair/loc_err_median": 0.05, "chair/voxel_iou": 0.9,
        "val_total": 1.0,
    }
    paths = trainer.write_chart_summaries(metrics, step=3)
    names = {os.path.basename(p) for p in paths}
    assert any(n.startswith("ap_bbox") for n in names)
    assert any(n.startswith("ap_segm") for n in names)
    assert any(n.startswith("pose_rot_err_median") for n in names)
    assert any(n.startswith("pose_voxel_iou") for n in names)
    assert all(os.path.isfile(p) for p in paths)


def test_detection_trainer_image_summaries(tmp_path):
    """write_image_summaries runs the heads at GT boxes and writes pred/GT
    pair images."""
    from mot3d_tpu.config import Config, DetectionConfig
    from mot3d_tpu.data.detection_loader import DetectionSample
    from mot3d_tpu.data.synthetic_detection import synthetic_detection_scene
    from mot3d_tpu.train.detection_trainer import DetectionTrainer

    det = DetectionConfig(
        pad_height=64, pad_width=64, image_height=64, image_width=64,
        rpn_pre_nms_topk_train=64, rpn_post_nms_topk_train=32,
        rpn_batch_per_image=16, roi_batch_per_image=8,
        detections_per_image=4, max_instances=3,
        anchor_sizes=(16, 32, 64, 128, 256), backbone_width=0.25,
        fpn_channels=64, mask_head_width=32, box_head_width=128,
        head_width_mult=0.125, fg_head_buffer=8)
    cfg = Config().replace(detection=det)
    scene = synthetic_detection_scene(det, batch=1, num_objects=2, seed=0)
    b = scene.images.shape[0]
    z = lambda *s: np.zeros(s, np.float32)
    m = det.max_instances
    batch = DetectionSample(
        image=scene.images, depth=z(b, 64, 64),
        campose=np.tile(np.eye(4, dtype=np.float32), (b, 1, 1)),
        boxes=scene.boxes, classes=scene.classes, valid=scene.valid,
        masks=scene.masks, voxels=scene.voxels, nocs=scene.nocs,
        boxes3d=z(b, m, 8, 3), object_ids=np.zeros((b, m), np.int32),
        locations=z(b, m, 3), rotations=z(b, m, 3),
        scales3d=np.ones((b, m), np.float32))
    trainer = DetectionTrainer(cfg, output_dir=str(tmp_path))
    trainer.train(iter([batch]), max_iter=1)
    paths = trainer.write_image_summaries(batch, step=1, max_instances=2)
    assert len(paths) == 4  # 2 instances x (voxel, nocs)
    assert all(os.path.isfile(p) for p in paths)
    names = {os.path.basename(p) for p in paths}
    assert any(n.startswith("voxels_") for n in names)
    assert any(n.startswith("nocs_") for n in names)
