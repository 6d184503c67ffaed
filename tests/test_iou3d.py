"""3D IoU / polygon clip vs shapely-free NumPy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from mot3d_tpu.geometry import (
    aabb_corners,
    box3d_iou,
    box3d_iou_matrix,
    box2d_iou_matrix,
    voxel_iou,
    polygon_clip_area,
)

RNG = np.random.default_rng(7)


def aabb(mins, maxs):
    return aabb_corners(jnp.array(mins, dtype=jnp.float32),
                        jnp.array(maxs, dtype=jnp.float32))


def analytic_aabb_iou(a_min, a_max, b_min, b_max):
    a_min, a_max = np.array(a_min), np.array(a_max)
    b_min, b_max = np.array(b_min), np.array(b_max)
    inter = np.clip(np.minimum(a_max, b_max) - np.maximum(a_min, b_min), 0, None)
    vi = inter.prod()
    va = (a_max - a_min).prod()
    vb = (b_max - b_min).prod()
    return vi / (va + vb - vi)


class TestBox3dIoU:
    def test_identical_boxes(self):
        b = aabb([0, 0, 0], [1, 2, 3])
        iou, iou2d = box3d_iou(b, b)
        np.testing.assert_allclose(float(iou), 1.0, atol=1e-5)
        np.testing.assert_allclose(float(iou2d), 1.0, atol=1e-5)

    def test_disjoint(self):
        b1 = aabb([0, 0, 0], [1, 1, 1])
        b2 = aabb([5, 5, 5], [6, 6, 6])
        iou, _ = box3d_iou(b1, b2)
        assert float(iou) == 0.0

    def test_axis_aligned_matches_analytic(self):
        for _ in range(20):
            a_min = RNG.uniform(-2, 0, 3)
            a_max = a_min + RNG.uniform(0.5, 2, 3)
            b_min = RNG.uniform(-2, 0, 3)
            b_max = b_min + RNG.uniform(0.5, 2, 3)
            iou, _ = box3d_iou(aabb(a_min, a_max), aabb(b_min, b_max))
            ref = analytic_aabb_iou(a_min, a_max, b_min, b_max)
            np.testing.assert_allclose(float(iou), ref, atol=1e-4)

    def test_rotated_half_overlap(self):
        # unit square rotated 90 deg about y = same box
        b1 = aabb([-0.5, 0, -0.5], [0.5, 1, 0.5])
        c = np.asarray(b1)
        rot = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], dtype=np.float32)
        b2 = jnp.array(c @ rot.T)
        from mot3d_tpu.geometry import sort_bbox
        iou, _ = box3d_iou(b1, sort_bbox(b2))
        np.testing.assert_allclose(float(iou), 1.0, atol=1e-4)

    def test_matrix_shape(self):
        boxes1 = jnp.stack([aabb([0, 0, 0], [1, 1, 1]), aabb([2, 0, 0], [3, 1, 1])])
        boxes2 = jnp.stack([aabb([0, 0, 0], [1, 1, 1])] * 3)
        m = box3d_iou_matrix(boxes1, boxes2)
        assert m.shape == (2, 3)
        np.testing.assert_allclose(np.asarray(m[0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m[1]), 0.0, atol=1e-5)


class TestPolygonClip:
    def test_square_clip(self):
        sq = jnp.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=jnp.float32)
        shifted = sq + jnp.array([0.5, 0.5])
        area, count = polygon_clip_area(sq, shifted)
        np.testing.assert_allclose(float(area), 0.25, atol=1e-6)

    def test_no_overlap(self):
        sq = jnp.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=jnp.float32)
        far = sq + 10.0
        area, count = polygon_clip_area(sq, far)
        assert float(area) == 0.0
        assert int(count) == 0

    def test_triangle_like_overlap(self):
        sq = jnp.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=jnp.float32)
        rot45 = jnp.array(
            [[1, -1.0], [3, 1], [1, 3], [-1, 1]], dtype=jnp.float32)  # diamond
        area, _ = polygon_clip_area(sq, rot45)
        # diamond centre (1,1), half-diagonal 2 inscribes the whole square
        np.testing.assert_allclose(float(area), 4.0, atol=1e-5)
        # a shifted diamond cuts one corner off
        area2, _ = polygon_clip_area(sq, rot45 + jnp.array([1.0, 1.0]))
        # diamond |x-2|+|y-2|<=2 clipped to [0,2]^2: triangle x+y>=2 -> area 2
        np.testing.assert_allclose(float(area2), 2.0, atol=1e-5)


class TestBox2dIoU:
    def test_matrix(self):
        b1 = jnp.array([[0, 0, 2, 2], [0, 0, 1, 1]], dtype=jnp.float32)
        b2 = jnp.array([[1, 1, 3, 3]], dtype=jnp.float32)
        m = np.asarray(box2d_iou_matrix(b1, b2))
        np.testing.assert_allclose(m[0, 0], 1 / 7, atol=1e-6)
        np.testing.assert_allclose(m[1, 0], 0.0, atol=1e-6)


class TestVoxelIoU:
    def test_half(self):
        pred = jnp.zeros((4, 4, 4)).at[:2].set(1.0)
        gt = jnp.zeros((4, 4, 4)).at[1:3].set(1.0)
        np.testing.assert_allclose(float(voxel_iou(pred, gt)), 1 / 3, atol=1e-6)
