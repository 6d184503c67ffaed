"""ROIAlign / NMS / segment ops vs independent oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mot3d_tpu.ops.roi_align import (
    roi_align,
    multilevel_roi_align,
    assign_fpn_level,
)
from mot3d_tpu.ops.nms import nms_mask, batched_nms_mask, top_k_by_score
from mot3d_tpu.ops.segment import segment_mean, segment_max, segment_sum

RNG = np.random.default_rng(5)


def np_roi_align_oracle(feat_hwc, boxes, out, scale=1.0, ratio=2):
    """Independent nested-loop NumPy oracle of ROIAlignV2 (aligned=True):
    half-pixel offset, ratio x ratio samples per bin averaged, bilinear
    interpolation with zero padding outside the map."""
    h, w, c = feat_hwc.shape

    def sample(y, x):
        if y <= -1 or y >= h or x <= -1 or x >= w:
            return np.zeros(c, feat_hwc.dtype)
        y = min(max(y, 0.0), h - 1.0)
        x = min(max(x, 0.0), w - 1.0)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        wy1, wx1 = y - y0, x - x0
        wy0, wx0 = 1 - wy1, 1 - wx1
        return (feat_hwc[y0, x0] * wy0 * wx0 + feat_hwc[y0, x1] * wy0 * wx1
                + feat_hwc[y1, x0] * wy1 * wx0 + feat_hwc[y1, x1] * wy1 * wx1)

    res = np.zeros((len(boxes), out, out, c), feat_hwc.dtype)
    for n, box in enumerate(boxes):
        x0, y0, x1, y1 = box * scale - 0.5
        bw, bh = (x1 - x0) / out, (y1 - y0) / out
        for py in range(out):
            for px in range(out):
                acc = np.zeros(c, feat_hwc.dtype)
                for iy in range(ratio):
                    for ix in range(ratio):
                        sy = y0 + (py + (iy + 0.5) / ratio) * bh
                        sx = x0 + (px + (ix + 0.5) / ratio) * bw
                        acc += sample(sy, sx)
                res[n, py, px] = acc / (ratio * ratio)
    return res


class TestRoiAlign:
    def test_matches_torchvision(self):
        
        feat = RNG.normal(size=(32, 40, 8)).astype(np.float32)
        boxes = np.array([
            [4.0, 4.0, 20.0, 28.0],
            [0.0, 0.0, 40.0, 32.0],
            [10.5, 3.2, 33.7, 17.9],
            [-5.0, -5.0, 10.0, 10.0],   # partially outside
        ], np.float32)
        ours = np.asarray(roi_align(jnp.array(feat), jnp.array(boxes), 7,
                                    spatial_scale=1.0, sampling_ratio=2))
        ref = np_roi_align_oracle(feat, boxes, 7, 1.0, 2)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_spatial_scale(self):
        
        feat = RNG.normal(size=(16, 20, 4)).astype(np.float32)
        boxes = np.array([[8.0, 8.0, 60.0, 50.0]], np.float32)
        ours = np.asarray(roi_align(jnp.array(feat), jnp.array(boxes), 14,
                                    spatial_scale=0.25, sampling_ratio=2))
        ref = np_roi_align_oracle(feat, boxes, 14, 0.25, 2)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_level_assignment(self):
        boxes = jnp.array([
            [0, 0, 32, 32],      # tiny -> level 2
            [0, 0, 224, 224],    # canonical -> level 4
            [0, 0, 1000, 1000],  # huge -> clamped to 5
        ], jnp.float32)
        lvls = np.asarray(assign_fpn_level(boxes))
        assert lvls[0] == 2 and lvls[1] == 4 and lvls[2] == 5

    def test_multilevel_matches_single_level(self):
        
        # Build a 4-level pyramid; use a box that lands on level 3.
        feats = [RNG.normal(size=(64 // 2**i, 80 // 2**i, 8)).astype(np.float32)
                 for i in range(4)]
        strides = [4, 8, 16, 32]
        box = np.array([[10.0, 10.0, 150.0, 155.0]], np.float32)  # ~level 3
        lvl = int(assign_fpn_level(jnp.array(box))[0])
        assert lvl == 3
        ours = np.asarray(multilevel_roi_align(
            [jnp.array(f) for f in feats], jnp.array(box), 7, strides))
        ref = np_roi_align_oracle(feats[lvl - 2], box, 7,
                                     1.0 / strides[lvl - 2], 2)
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def nms_oracle(boxes, scores, thr):
    """Plain numpy NMS."""
    order = np.argsort(-scores)
    keep = []
    for i in order:
        ok = True
        for j in keep:
            bi, bj = boxes[i], boxes[j]
            xx0, yy0 = max(bi[0], bj[0]), max(bi[1], bj[1])
            xx1, yy1 = min(bi[2], bj[2]), min(bi[3], bj[3])
            inter = max(0, xx1 - xx0) * max(0, yy1 - yy0)
            a = (bi[2] - bi[0]) * (bi[3] - bi[1])
            b = (bj[2] - bj[0]) * (bj[3] - bj[1])
            if inter / (a + b - inter) > thr:
                ok = False
                break
        if ok:
            keep.append(i)
    return sorted(keep)


class TestNMS:
    def test_matches_oracle(self):
        for seed in range(5):
            rng = np.random.default_rng(seed)
            n = 40
            xy = rng.uniform(0, 100, size=(n, 2))
            wh = rng.uniform(5, 40, size=(n, 2))
            boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
            scores = rng.uniform(size=n).astype(np.float32)
            keep = np.asarray(nms_mask(jnp.array(boxes), jnp.array(scores),
                                       jnp.ones(n, bool), 0.5))
            assert sorted(np.nonzero(keep)[0].tolist()) == \
                nms_oracle(boxes, scores, 0.5)

    def test_invalid_dropped(self):
        boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
        scores = jnp.array([0.9, 0.8])
        keep = np.asarray(nms_mask(boxes, scores,
                                   jnp.array([False, True]), 0.5))
        assert not keep[0] and keep[1]

    def test_batched_classes_do_not_suppress(self):
        boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
        scores = jnp.array([0.9, 0.8])
        keep = np.asarray(batched_nms_mask(boxes, scores,
                                           jnp.array([0, 1]),
                                           jnp.ones(2, bool), 0.3))
        assert keep.all()

    def test_exact_fixpoint_handles_chains(self):
        # A suppression chain: box0 kills box1, box1 (suppressed) would have
        # killed box2 — exact NMS must keep {0, 2}; fast NMS keeps {0} only.
        boxes = jnp.array([[0, 0, 10, 10], [5, 0, 15, 10], [10, 0, 20, 10]],
                          jnp.float32)
        scores = jnp.array([0.9, 0.8, 0.7])
        keep = np.asarray(nms_mask(boxes, scores, jnp.ones(3, bool), 0.3,
                                   exact=True))
        assert keep.tolist() == [True, False, True]
        fast = np.asarray(nms_mask(boxes, scores, jnp.ones(3, bool), 0.3,
                                   exact=False))
        assert fast.tolist() == [True, False, False]

    def test_tie_break_by_index(self):
        # Equal scores: the lower original index ranks higher (stable
        # descending sort order), for both exact and fast variants.
        boxes = jnp.array([[0, 0, 10, 10], [1, 0, 11, 10]], jnp.float32)
        scores = jnp.array([0.5, 0.5])
        for exact in (True, False):
            keep = np.asarray(nms_mask(boxes, scores, jnp.ones(2, bool),
                                       0.3, exact=exact))
            assert keep.tolist() == [True, False]

    def test_classwise_matches_flat_offset_trick(self):
        from mot3d_tpu.ops.nms import classwise_nms_mask
        for seed in range(4):
            rng = np.random.default_rng(seed)
            p, cc = 24, 3
            xy = rng.uniform(0, 80, size=(p, cc, 2))
            wh = rng.uniform(5, 50, size=(p, cc, 2))
            boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
            scores = rng.uniform(size=(p, cc)).astype(np.float32)
            valid = rng.uniform(size=(p, cc)) < 0.8
            flat_cls = jnp.tile(jnp.arange(cc, dtype=jnp.int32), p)
            for exact in (True, False):
                kw = np.asarray(classwise_nms_mask(
                    jnp.array(boxes), jnp.array(scores), jnp.array(valid),
                    0.4, exact)).reshape(-1)
                kf = np.asarray(batched_nms_mask(
                    jnp.array(boxes.reshape(-1, 4)),
                    jnp.array(scores.reshape(-1)), flat_cls,
                    jnp.array(valid.reshape(-1)), 0.4, exact))
                np.testing.assert_array_equal(kw, kf)

    def test_exact_randomised_vs_oracle_dense(self):
        # Heavier overlap density than test_matches_oracle: long chains
        # exercise the fixpoint iteration rather than one-step convergence.
        for seed in range(6):
            rng = np.random.default_rng(100 + seed)
            n = 80
            xy = rng.uniform(0, 40, size=(n, 2))
            wh = rng.uniform(10, 30, size=(n, 2))
            boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
            scores = rng.uniform(size=n).astype(np.float32)
            keep = np.asarray(nms_mask(jnp.array(boxes), jnp.array(scores),
                                       jnp.ones(n, bool), 0.5))
            assert sorted(np.nonzero(keep)[0].tolist()) == \
                nms_oracle(boxes, scores, 0.5)

    def test_top_k(self):
        scores = jnp.array([0.1, 0.9, 0.5, 0.7])
        valid = jnp.array([True, False, True, True])
        idx, ok = top_k_by_score(scores, valid, 3)
        assert np.asarray(idx)[:2].tolist() == [3, 2]
        assert np.asarray(ok).tolist() == [True, True, True]
        idx, ok = top_k_by_score(scores, jnp.array([True, False, False, False]), 3)
        assert np.asarray(ok).tolist() == [True, False, False]


class TestSegmentOps:
    def test_mean_masked(self):
        data = jnp.array([[1.0], [3.0], [100.0], [5.0]])
        ids = jnp.array([0, 0, 0, 1])
        mask = jnp.array([True, True, False, True])
        out = np.asarray(segment_mean(data, ids, 3, mask))
        np.testing.assert_allclose(out[:, 0], [2.0, 5.0, 0.0])

    def test_max_empty_is_zero(self):
        data = jnp.array([[2.0], [-7.0]])
        ids = jnp.array([0, 0])
        out = np.asarray(segment_max(data, ids, 2, jnp.array([True, True])))
        np.testing.assert_allclose(out[:, 0], [2.0, 0.0])

    def test_sum(self):
        data = jnp.ones((4, 2))
        ids = jnp.array([1, 1, 1, 0])
        out = np.asarray(segment_sum(data, ids, 2))
        np.testing.assert_allclose(out, [[1, 1], [3, 3]])


class TestPallasNMS:
    def test_matches_exact_nms(self):
        # Interpreter mode exercises the kernel logic on CPU.
        from unittest import mock
        from jax.experimental import pallas as pl
        from mot3d_tpu.ops.pallas import nms_kernel

        orig = pl.pallas_call

        def interp(*a, **k):
            k["interpret"] = True
            return orig(*a, **k)

        rng = np.random.default_rng(3)
        n = 64
        xy = rng.uniform(0, 100, size=(n, 2))
        wh = rng.uniform(5, 40, size=(n, 2))
        boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        scores = rng.uniform(size=n).astype(np.float32)
        valid = np.ones(n, bool)
        valid[5] = False
        with mock.patch.object(nms_kernel.pl, "pallas_call", interp):
            keep_p = np.asarray(nms_kernel.pallas_nms_mask(
                jnp.array(boxes), jnp.array(scores), jnp.array(valid), 0.5))
        keep_x = np.asarray(nms_mask(jnp.array(boxes), jnp.array(scores),
                                     jnp.array(valid), 0.5, exact=True))
        np.testing.assert_array_equal(keep_p, keep_x)


def test_roi_align_matmul_matches_gather():
    """The separable-matmul single-level ROIAlign must equal the gather
    form exactly (same subsample/bilinear weights, reassociated)."""
    import jax.numpy as jnp
    import numpy as np
    from mot3d_tpu.ops.roi_align import roi_align, roi_align_matmul
    rng = np.random.default_rng(3)
    feat = jnp.asarray(rng.normal(size=(40, 52, 6)), jnp.float32)
    boxes = np.zeros((9, 4), np.float32)
    boxes[:, 0] = rng.uniform(-5, 40, 9)
    boxes[:, 1] = rng.uniform(-5, 30, 9)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(2, 20, 9)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(2, 20, 9)
    a = np.asarray(roi_align(feat, jnp.asarray(boxes), 7))
    b = np.asarray(roi_align_matmul(feat, jnp.asarray(boxes), 7))
    np.testing.assert_allclose(b, a, atol=2e-5)
