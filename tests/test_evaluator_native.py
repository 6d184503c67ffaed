"""Native RLE codec, COCO AP protocol, voxelizer, edge metrics."""

import numpy as np
import pytest

from mot3d_tpu.evaluator import rle
from mot3d_tpu.evaluator.coco_eval import COCOEvaluator, compute_ap
from mot3d_tpu.evaluator.edge_metrics import edge_precision_recall_f1
from mot3d_tpu.data.voxelize import (tri_box_overlap, voxelize_surface,
                                     points_in_mesh, voxelize_fill)

RNG = np.random.default_rng(21)


class TestRLE:
    def test_roundtrip(self):
        for _ in range(5):
            m = (RNG.uniform(size=(37, 53)) < 0.4)
            r = rle.encode(m)
            np.testing.assert_array_equal(rle.decode(r), m)

    def test_area(self):
        m = np.zeros((10, 10), bool)
        m[2:5, 3:7] = True
        assert rle.area(rle.encode(m)) == 12

    def test_merge_union_intersection(self):
        a = np.zeros((20, 20), bool); a[:10] = True
        b = np.zeros((20, 20), bool); b[5:15] = True
        u = rle.decode(rle.merge([rle.encode(a), rle.encode(b)], False))
        i = rle.decode(rle.merge([rle.encode(a), rle.encode(b)], True))
        np.testing.assert_array_equal(u.astype(bool), a | b)
        np.testing.assert_array_equal(i.astype(bool), a & b)

    def test_iou(self):
        a = np.zeros((16, 16), bool); a[:8] = True
        b = np.zeros((16, 16), bool); b[4:12] = True
        m = rle.iou([rle.encode(a)], [rle.encode(b)])
        np.testing.assert_allclose(m[0, 0], 64 / 192, atol=1e-9)

    def test_iou_crowd(self):
        a = np.zeros((16, 16), bool); a[:8] = True
        b = np.ones((16, 16), bool)
        m = rle.iou([rle.encode(a)], [rle.encode(b)], iscrowd=[1])
        np.testing.assert_allclose(m[0, 0], 1.0)

    def test_string_roundtrip(self):
        for _ in range(5):
            m = (RNG.uniform(size=(29, 31)) < 0.3)
            r = rle.encode(m)
            s = rle.to_string(r)
            back = rle.from_string(s, r["size"])
            np.testing.assert_array_equal(back["counts"], r["counts"])

    def test_string_matches_pycocotools_format(self):
        # Known vector: a simple mask, verified against the COCO LEB-ish
        # encoding semantics (delta from two back, 6-bit chunks + 48).
        m = np.zeros((4, 4), bool)
        m[1:3, 1:3] = True
        r = rle.encode(m)
        np.testing.assert_array_equal(r["counts"], [5, 2, 2, 2, 5])
        s = rle.to_string(r)
        back = rle.from_string(s, [4, 4])
        np.testing.assert_array_equal(back["counts"], r["counts"])

    def test_bbox(self):
        m = np.zeros((20, 30), bool)
        m[5:9, 10:14] = True
        np.testing.assert_allclose(rle.bbox(rle.encode(m)), [10, 5, 4, 4])


class TestCocoAP:
    def _img(self, n_gt=3, perfect=True, seed=0):
        rng = np.random.default_rng(seed)
        gt = np.concatenate([rng.uniform(0, 50, (n_gt, 2)),
                             rng.uniform(10, 30, (n_gt, 2))], 1)
        if perfect:
            dt = gt.copy()
        else:
            dt = gt + rng.uniform(20, 30, gt.shape)
        return {
            "dt_boxes": dt, "dt_scores": np.linspace(0.9, 0.5, n_gt),
            "dt_classes": np.zeros(n_gt, int),
            "gt_boxes": gt, "gt_classes": np.zeros(n_gt, int),
        }

    def test_perfect_detections_ap1(self):
        res = compute_ap([self._img(perfect=True, seed=s) for s in range(3)],
                         num_classes=1)
        np.testing.assert_allclose(res["AP"], 1.0, atol=1e-6)
        np.testing.assert_allclose(res["AP50"], 1.0, atol=1e-6)

    def test_bad_detections_ap0(self):
        res = compute_ap([self._img(perfect=False, seed=s) for s in range(3)],
                         num_classes=1)
        assert res["AP"] < 0.05

    def test_half_detections(self):
        imgs = []
        for s in range(4):
            img = self._img(n_gt=2, perfect=True, seed=s)
            # drop one detection per image -> recall 0.5, precision 1
            img["dt_boxes"] = img["dt_boxes"][:1]
            img["dt_scores"] = img["dt_scores"][:1]
            img["dt_classes"] = img["dt_classes"][:1]
            imgs.append(img)
        res = compute_ap(imgs, num_classes=1)
        np.testing.assert_allclose(res["AP"], 0.5, atol=0.02)

    def test_area_range_breakdown(self):
        """APs/APm/APl (pycocotools Params.areaRng, FrontCocoEval.py):
        each range scores only its own GTs; absent regimes are omitted."""
        def img(size, n=2, seed=0):
            rng = np.random.default_rng(seed)
            xy = rng.uniform(0, 50, (n, 2))
            gt = np.concatenate([xy, np.full((n, 2), float(size))], 1)
            return {"dt_boxes": gt.copy(),
                    "dt_scores": np.linspace(0.9, 0.5, n),
                    "dt_classes": np.zeros(n, int),
                    "gt_boxes": gt, "gt_classes": np.zeros(n, int)}

        # 20x20=400 (small), 50x50=2500 (medium), 100x100=1e4 (large).
        res = compute_ap([img(20, seed=0), img(50, seed=1),
                          img(100, seed=2)], num_classes=1)
        for key in ("AP", "APs", "APm", "APl"):
            np.testing.assert_allclose(res[key], 1.0, atol=1e-6,
                                       err_msg=key)
        # Only small objects -> medium/large ranges have no GT: omitted.
        res_s = compute_ap([img(20)], num_classes=1)
        np.testing.assert_allclose(res_s["APs"], 1.0, atol=1e-6)
        assert "APm" not in res_s and "APl" not in res_s

    def test_area_range_ignore_semantics(self):
        """An unmatched OUT-of-range detection must not be an FP for the
        range (COCOeval ignore handling), and an out-of-range GT is
        matchable-but-ignored rather than deleted."""
        gt = np.array([[5.0, 5.0, 20.0, 20.0]])       # small (400)
        big_dt = np.array([[40.0, 40.0, 100.0, 100.0]])  # large, unmatched
        img = {"dt_boxes": np.concatenate([gt, big_dt]),
               "dt_scores": np.array([0.6, 0.9]),  # spurious scores HIGHER
               "dt_classes": np.zeros(2, int),
               "gt_boxes": gt, "gt_classes": np.zeros(1, int)}
        res = compute_ap([img], num_classes=1)
        # In the small range the large spurious detection is ignored:
        np.testing.assert_allclose(res["APs"], 1.0, atol=1e-6)
        # In the unrestricted range it IS a higher-scored FP:
        assert res["AP"] < 1.0

    def test_evaluator_with_masks(self):
        ev = COCOEvaluator(num_classes=2)
        gt_boxes = np.array([[5.0, 5.0, 20.0, 25.0]])
        masks = np.zeros((1, 40, 40), np.float32)
        masks[0, 5:25, 5:20] = 1.0
        ev.add_image(gt_boxes, np.array([0.9]), np.array([0]),
                     np.array([True]), gt_boxes, np.array([0]),
                     np.array([True]), dt_masks=masks, gt_masks=masks)
        out = ev.summarize()
        np.testing.assert_allclose(out["bbox/AP"], 1.0, atol=1e-6)
        np.testing.assert_allclose(out["segm/AP"], 1.0, atol=1e-6)


class TestVoxelizer:
    def test_tri_box_overlap(self):
        tri = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]])
        assert tri_box_overlap([0.2, 0.2, 0.0], [0.1, 0.1, 0.1], tri)
        assert not tri_box_overlap([2.0, 2.0, 2.0], [0.1, 0.1, 0.1], tri)
        # box just above the triangle plane
        assert not tri_box_overlap([0.2, 0.2, 0.5], [0.1, 0.1, 0.1], tri)

    def _cube_mesh(self, lo=0.25, hi=0.75):
        v = np.array([[x, y, z] for x in (lo, hi) for y in (lo, hi)
                      for z in (lo, hi)])
        f = np.array([
            [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
            [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
            [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
        ])
        return v, f

    def test_voxelize_cube_surface(self):
        v, f = self._cube_mesh()
        g = voxelize_surface(v, f, 16)
        # shell occupied, centre empty
        assert g[8, 8, 4]      # bottom face
        assert not g[8, 8, 8]  # interior
        assert not g[1, 1, 1]  # outside

    def test_points_in_mesh(self):
        v, f = self._cube_mesh()
        pts = np.array([[0.5, 0.5, 0.5], [0.1, 0.1, 0.1], [0.3, 0.3, 0.3],
                        [0.9, 0.5, 0.5]])
        inside = points_in_mesh(v, f, pts)
        np.testing.assert_array_equal(inside, [True, False, True, False])

    def test_voxelize_fill(self):
        v, f = self._cube_mesh()
        g = voxelize_fill(v, f, 16)
        assert g[8, 8, 8]      # interior filled
        assert not g[1, 1, 1]


class TestEdgeMetrics:
    def test_values(self):
        probs = np.array([0.9, 0.8, 0.2, 0.6])
        targets = np.array([1.0, 0.0, 0.0, 1.0])
        m = edge_precision_recall_f1(probs, targets)
        np.testing.assert_allclose(m["precision"], 2 / 3)
        np.testing.assert_allclose(m["recall"], 1.0)

    def test_mask(self):
        probs = np.array([0.9, 0.9])
        targets = np.array([1.0, 0.0])
        m = edge_precision_recall_f1(probs, targets,
                                     mask=np.array([True, False]))
        np.testing.assert_allclose(m["precision"], 1.0)
