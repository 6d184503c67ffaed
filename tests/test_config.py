"""Config tree + CLI override parsing."""

from mot3d_tpu.config import apply_overrides, default_config


class TestOverrides:
    def test_types(self):
        cfg = default_config()
        out = apply_overrides(cfg, [
            "tracking.learning_rate=5e-4",
            "tracking.seq_len=10",
            "detection.fast_nms=false",
            "pose.solver=svd",
            "detection.anchor_sizes=16,32,64,128,256",
        ])
        assert out.tracking.learning_rate == 5e-4
        assert out.tracking.seq_len == 10
        assert out.detection.fast_nms is False
        assert out.pose.solver == "svd"
        assert out.detection.anchor_sizes == (16, 32, 64, 128, 256)
        # untouched sections unchanged
        assert out.graph == cfg.graph

    def test_reference_constants_present(self):
        """The reference's magic constants are named fields (SURVEY §5.6)."""
        cfg = default_config()
        assert cfg.combined.objectness_thres == 0.35
        assert cfg.combined.iou2d_thres == 0.35
        assert cfg.tracking.box_iou_thres == 0.01
        assert cfg.tracking.mota_l2_gate == 0.4
        assert abs(cfg.camera.fx - 292.87803547399) < 1e-9
        assert cfg.detection.nms_thresh_test == 0.4
        assert cfg.detection.roi_iou_threshold == 0.75
        assert cfg.graph.num_mp_steps == 4
        assert cfg.tracking.max_frame_dist == 5

    def test_derived_sizes(self):
        cfg = default_config()
        t = cfg.tracking
        assert t.max_nodes == 25 * 8
        # pairs: 5 * 20 + 4 + 3 + 2 + 1 = 110; x 64 slot pairs
        assert t.max_directed_edges == 110 * 64
