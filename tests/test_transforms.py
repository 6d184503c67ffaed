"""Geometry transforms vs independent NumPy/SciPy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from mot3d_tpu.geometry import (
    euler_to_rotmat,
    rotmat_to_euler,
    quaternion_from_euler,
    cam_to_world,
    cad2world_matrix,
    aabb_corners,
    sort_bbox,
    box_corners_to_minmax,
)

RNG = np.random.default_rng(0)


def random_euler(n):
    return RNG.uniform(-np.pi, np.pi, size=(n, 3)).astype(np.float32)


class TestEuler:
    def test_matches_scipy_extrinsic_xyz(self):
        # Blender mathutils.Euler XYZ == scipy extrinsic lowercase 'xyz'.
        eulers = random_euler(32)
        ours = np.asarray(euler_to_rotmat(jnp.array(eulers)))
        ref = Rotation.from_euler("xyz", eulers).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_roundtrip(self):
        eulers = RNG.uniform(-1.2, 1.2, size=(16, 3)).astype(np.float32)
        r = euler_to_rotmat(jnp.array(eulers))
        back = rotmat_to_euler(r)
        r2 = euler_to_rotmat(back)
        np.testing.assert_allclose(np.asarray(r), np.asarray(r2), atol=1e-4)

    def test_quaternion_matches_scipy(self):
        eulers = random_euler(16)
        ours = np.asarray(quaternion_from_euler(jnp.array(eulers)))
        ref = Rotation.from_euler("xyz", eulers).as_quat()  # [x, y, z, w]
        # quaternions are sign-ambiguous
        sign = np.sign(np.sum(ours * ref, axis=-1, keepdims=True))
        np.testing.assert_allclose(ours * sign, ref, atol=1e-5)


class TestCamToWorld:
    def test_matches_manual(self):
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = Rotation.from_euler("xyz", [0.3, -0.2, 0.5]).as_matrix()
        pose[:3, 3] = [1.0, 2.0, -0.5]
        pts = RNG.normal(size=(50, 3)).astype(np.float32)
        ours = np.asarray(cam_to_world(jnp.array(pts), jnp.array(pose)))
        ref = (pose[:3, :3] @ pts.T + pose[:3, 3:]).T
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestBoxes:
    def test_aabb_corner_order_is_sort_bbox_fixed_point(self):
        mins = jnp.array([-1.0, -2.0, -3.0])
        maxs = jnp.array([2.0, 1.0, 0.5])
        corners = aabb_corners(mins, maxs)
        resorted = sort_bbox(corners)
        np.testing.assert_allclose(np.asarray(corners), np.asarray(resorted))

    def test_sort_bbox_recovers_canonical_from_shuffled(self):
        mins = jnp.array([0.0, 0.0, 0.0])
        maxs = jnp.array([2.0, 3.0, 4.0])
        corners = np.asarray(aabb_corners(mins, maxs))
        perm = RNG.permutation(8)
        resorted = np.asarray(sort_bbox(jnp.array(corners[perm])))
        np.testing.assert_allclose(resorted, corners, atol=1e-6)

    def test_canonical_order_matches_reference_semantics(self):
        # Reference sort_bbox (PoseEst/pose_estimation.py:72-93) independently
        # re-implemented in numpy as an oracle.
        def np_sort_bbox(b):
            b = b[np.flip(np.argsort(b[:, 1]))]
            i1 = np.flip(np.argsort(b[0:4, 0]))
            i2 = np.flip(np.argsort(b[4:8, 0])) + 4
            b = b[np.concatenate([i1, i2])]
            z1 = np.flip(np.argsort(b[0:2, 2]))
            z2 = np.argsort(b[2:4, 2]) + 2
            z3 = np.flip(np.argsort(b[4:6, 2])) + 4
            z4 = np.argsort(b[6:8, 2]) + 6
            return b[np.concatenate([z1, z2, z3, z4])]

        for _ in range(5):
            center = RNG.normal(size=3)
            half = RNG.uniform(0.5, 2.0, size=3)
            corners = center + np.array(
                [[sx, sy, sz] for sx in (1, -1) for sy in (1, -1) for sz in (1, -1)]
            ) * half
            perm = RNG.permutation(8)
            ours = np.asarray(sort_bbox(jnp.array(corners[perm], dtype=jnp.float32)))
            ref = np_sort_bbox(corners[perm])
            np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_minmax(self):
        corners = aabb_corners(jnp.array([0.0, 1.0, 2.0]), jnp.array([1.0, 2.0, 3.0]))
        mm = np.asarray(box_corners_to_minmax(corners))
        np.testing.assert_allclose(mm, [0, 1, 2, 1, 2, 3], atol=1e-6)


class TestCad2World:
    def test_scale_rotation_composition(self):
        euler = jnp.array([0.1, 0.7, -0.3])
        loc = jnp.array([1.0, 2.0, 3.0])
        mat = np.asarray(cad2world_matrix(euler, loc, jnp.asarray(2.0)))
        ref_rot = Rotation.from_euler("xyz", np.asarray(euler)).as_matrix()
        np.testing.assert_allclose(mat[:3, :3], 2.0 * ref_rot, atol=1e-5)
        np.testing.assert_allclose(mat[:3, 3], np.asarray(loc), atol=1e-6)
        np.testing.assert_allclose(mat[3], [0, 0, 0, 1])


class TestEulerGradSafety:
    def test_gimbal_pole_gradient_finite(self):
        """arcsin'(+-1) = inf and arctan2(0,0)'s 0/0 VJP must not emit
        non-finite partials — even under a ZERO cotangent they poison the
        joint gradient (0 * inf); root cause of the round-4
        differentiable-pose training NaN (NOTES_ROUND4.md)."""
        import jax
        from mot3d_tpu.geometry.transforms import (euler_to_rotmat,
                                                   rotmat_to_euler)
        poles = [
            jnp.array([0.0, np.pi / 2, 0.0]),    # sy = +1 exactly
            jnp.array([0.0, -np.pi / 2, 0.0]),   # sy = -1
            jnp.array([0.3, np.pi / 2, -0.2]),   # pole w/ other angles
            jnp.array([0.0, 0.0, np.pi]),        # 180 about z
            jnp.array([np.pi, 0.0, 0.0]),
        ]
        for e in poles:
            r = euler_to_rotmat(e)
            g_live = jax.grad(lambda m: rotmat_to_euler(m).sum())(r)
            assert np.isfinite(np.asarray(g_live)).all(), e
            # zero-cotangent composition (empty-graph where() in the
            # combined step): the gradient must be exactly zero, not NaN.
            g_zero = jax.grad(
                lambda m: jnp.where(False, rotmat_to_euler(m).sum(), 0.0))(r)
            np.testing.assert_array_equal(np.asarray(g_zero),
                                          np.zeros((3, 3), np.float32))

    def test_pole_values_still_correct(self):
        from mot3d_tpu.geometry.transforms import (euler_to_rotmat,
                                                   rotmat_to_euler)
        e = jnp.array([0.0, np.pi / 2, 0.0])
        got = np.asarray(rotmat_to_euler(euler_to_rotmat(e)))
        r2 = np.asarray(euler_to_rotmat(jnp.asarray(got)))
        np.testing.assert_allclose(r2, np.asarray(euler_to_rotmat(e)),
                                   atol=1e-5)
