"""Backprojection + statistical outlier removal tests."""

import numpy as np
import jax.numpy as jnp

from mot3d_tpu.geometry import (
    backproject_depth,
    make_intrinsics,
    statistical_outlier_mask,
)
from mot3d_tpu.geometry.backproject import gather_masked_points

RNG = np.random.default_rng(3)


def np_backproject_oracle(depth, intrinsics, mask):
    """Independent NumPy oracle of PoseEst/pose_estimation.py:16-43."""
    inv = np.linalg.inv(intrinsics)
    final = np.logical_and(mask, depth > 0)
    ys, xs = np.where(final)
    uv = np.stack([xs, ys, np.ones_like(xs)], axis=0).astype(np.float64)
    xyz = (inv @ uv).T
    z = depth[ys, xs]
    pts = xyz * z[:, None] / xyz[:, -1:]
    pts[:, 1] *= -1
    pts[:, 2] *= -1
    return pts, (ys, xs)


class TestBackproject:
    def test_matches_oracle(self):
        h, w = 24, 32
        depth = RNG.uniform(0.5, 3.0, size=(h, w)).astype(np.float32)
        depth[RNG.uniform(size=(h, w)) < 0.3] = 0.0
        mask = RNG.uniform(size=(h, w)) < 0.7
        K = np.array([[100.0, 0, w / 2 - 0.5], [0, 100.0, h / 2 - 0.5], [0, 0, 1]])

        pts_map, valid = backproject_depth(jnp.array(depth), jnp.array(K),
                                           jnp.array(mask))
        ref_pts, (ys, xs) = np_backproject_oracle(depth, K, mask)

        ours_at_ref = np.asarray(pts_map)[ys, xs]
        np.testing.assert_allclose(ours_at_ref, ref_pts, atol=1e-4)
        assert np.array_equal(np.asarray(valid), np.logical_and(mask, depth > 0))

    def test_gather_under_capacity(self):
        h, w = 8, 8
        depth = np.ones((h, w), np.float32)
        mask = np.zeros((h, w), bool)
        mask[2, 3] = mask[5, 6] = True
        K = make_intrinsics(50.0, 50.0, 3.5, 3.5)
        pts_map, valid = backproject_depth(jnp.array(depth), K, jnp.array(mask))
        pts, ok = gather_masked_points(pts_map, valid, max_points=16)
        assert int(ok.sum()) == 2
        got = np.asarray(pts)[np.asarray(ok)]
        want = np.asarray(pts_map)[mask]
        np.testing.assert_allclose(np.sort(got, axis=0), np.sort(want, axis=0),
                                   atol=1e-6)

    def test_gather_over_capacity_strides(self):
        pts = np.arange(100, dtype=np.float32)[:, None].repeat(3, 1).reshape(10, 10, 3)
        valid = np.ones((10, 10), bool)
        out, ok = gather_masked_points(jnp.array(pts), jnp.array(valid), 10)
        assert bool(ok.all())
        vals = np.asarray(out)[:, 0]
        # Even stride across 0..99 (one representative per decade).
        assert vals.min() < 10 and vals.max() >= 90
        assert len(np.unique(vals // 10)) == 10


class TestOutlier:
    def test_removes_far_points(self):
        cluster = RNG.normal(size=(200, 3)).astype(np.float32) * 0.1
        outliers = np.array([[5, 5, 5], [-6, 2, 9], [0, 10, 0]], np.float32)
        pts = np.concatenate([cluster, outliers])
        valid = np.ones(len(pts), bool)
        keep = np.asarray(statistical_outlier_mask(
            jnp.array(pts), jnp.array(valid), nb_neighbors=20, std_ratio=2.0,
            min_points=10))
        assert not keep[-3:].any()
        assert keep[:200].mean() > 0.9

    def test_skips_small_sets(self):
        pts = RNG.normal(size=(30, 3)).astype(np.float32)
        valid = np.ones(30, bool)
        keep = np.asarray(statistical_outlier_mask(
            jnp.array(pts), jnp.array(valid), min_points=100))
        assert keep.all()

    def test_candidate_subset_tracks_full(self):
        # The pipeline's hot configuration: 1024-point buffer, strided
        # 256-candidate kNN.  The kept set must agree with the full pass on
        # all clear inliers/outliers (the statistic is a scaled estimate, so
        # only borderline points may flip).
        cluster = RNG.normal(size=(900, 3)).astype(np.float32) * 0.1
        outliers = RNG.normal(size=(24, 3)).astype(np.float32) * 0.1
        outliers += np.sign(outliers) * 4.0  # push well outside the cluster
        pad = np.zeros((100, 3), np.float32)
        pts = np.concatenate([cluster, outliers, pad])
        valid = np.concatenate([np.ones(924, bool), np.zeros(100, bool)])
        full = np.asarray(statistical_outlier_mask(
            jnp.array(pts), jnp.array(valid), min_points=10, approx=False))
        sub = np.asarray(statistical_outlier_mask(
            jnp.array(pts), jnp.array(valid), min_points=10, approx=False,
            candidates=256))
        assert not sub[924:].any()
        assert not sub[900:924].any()          # outliers still removed
        assert sub[:900].mean() > 0.95         # inliers still kept
        agree = (full[:924] == sub[:924]).mean()
        assert agree > 0.97, agree

    def test_candidate_columns_cover_nondivisible_n(self):
        # candidates that do not divide n must still sample the WHOLE
        # buffer, not a prefix (a 600-of-1024 subset with integer stride 1
        # would starve slots 600..1023 of neighbour candidates, biasing the
        # kNN statistic against the tail of a raster-ordered buffer).
        cluster = RNG.normal(size=(1000, 3)).astype(np.float32) * 0.1
        outliers = RNG.normal(size=(24, 3)).astype(np.float32) * 0.1
        outliers += np.sign(outliers) * 4.0
        pts = np.concatenate([cluster, outliers])
        valid = np.ones(1024, bool)
        full = np.asarray(statistical_outlier_mask(
            jnp.array(pts), jnp.array(valid), min_points=10, approx=False))
        sub = np.asarray(statistical_outlier_mask(
            jnp.array(pts), jnp.array(valid), min_points=10, approx=False,
            candidates=600))
        assert not sub[1000:].any()            # outliers removed
        assert sub[:1000].mean() > 0.95        # inliers kept
        agree = (full == sub).mean()
        assert agree > 0.97, agree
        # Tail slots must behave like head slots (no positional bias).
        assert sub[500:1000].mean() > 0.95

    def test_padding_ignored(self):
        cluster = RNG.normal(size=(150, 3)).astype(np.float32) * 0.1
        pad = np.full((50, 3), 1e6, np.float32)
        pts = np.concatenate([cluster, pad])
        valid = np.concatenate([np.ones(150, bool), np.zeros(50, bool)])
        keep = np.asarray(statistical_outlier_mask(
            jnp.array(pts), jnp.array(valid), min_points=10))
        assert not keep[150:].any()
        assert keep[:150].mean() > 0.9


class TestOutlierPallasKernel:
    """The fused VMEM kernel (interpret mode on CPU) vs the exact XLA path.

    The kernel does exact min-extraction k-NN; the XLA exact path
    (approx=False) is jax.lax.top_k — identical selections, so the kept
    masks must agree exactly and the mean-kNN statistic to f32 roundoff.
    """

    def _agree(self, pts, valid, candidates):
        xla = np.asarray(statistical_outlier_mask(
            jnp.array(pts), jnp.array(valid), min_points=10, approx=False,
            candidates=candidates, impl="xla"))
        ker = np.asarray(statistical_outlier_mask(
            jnp.array(pts), jnp.array(valid), min_points=10,
            candidates=candidates, impl="pallas_interpret"))
        assert (xla == ker).all(), (xla != ker).sum()

    def test_matches_exact_xla_subset(self):
        cluster = RNG.normal(size=(900, 3)).astype(np.float32) * 0.1
        outliers = RNG.normal(size=(24, 3)).astype(np.float32) * 0.1
        outliers += np.sign(outliers) * 4.0
        pad = np.zeros((100, 3), np.float32)
        pts = np.concatenate([cluster, outliers, pad])
        valid = np.concatenate([np.ones(924, bool), np.zeros(100, bool)])
        self._agree(pts, valid, candidates=256)

    def test_matches_exact_xla_full(self):
        pts = RNG.normal(size=(256, 3)).astype(np.float32)
        pts[200:] *= 8.0
        valid = np.ones(256, bool)
        self._agree(pts, valid, candidates=0)

    def test_vmapped(self):
        import jax
        pts = RNG.normal(size=(3, 256, 3)).astype(np.float32)
        pts[:, 240:] *= 10.0
        valid = np.ones((3, 256), bool)
        f = jax.vmap(lambda p, v: statistical_outlier_mask(
            p, v, min_points=10, candidates=64, impl="pallas_interpret"))
        g = jax.vmap(lambda p, v: statistical_outlier_mask(
            p, v, min_points=10, candidates=64, approx=False, impl="xla"))
        ker = np.asarray(f(jnp.array(pts), jnp.array(valid)))
        xla = np.asarray(g(jnp.array(pts), jnp.array(valid)))
        assert (ker == xla).all()
