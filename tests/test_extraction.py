"""Box-grid pose point extraction (pose/extraction.py) vs the full
paste+gather path — the two must produce the same point sets where the
semantics coincide, and the same downstream pose."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mot3d_tpu.config import CameraConfig, Config, PoseConfig
from mot3d_tpu.geometry.backproject import make_intrinsics
from mot3d_tpu.pose.extraction import grid_extract
from mot3d_tpu.pose.pipeline import estimate_object_pose


def _scene(h=64, w=64):
    """Depth plane + a NOCS patch encoding a known similarity transform."""
    rng = np.random.default_rng(0)
    depth = np.zeros((h, w), np.float32)
    box = np.array([16.0, 16.0, 48.0, 48.0], np.float32)
    depth[16:48, 16:48] = rng.uniform(2.0, 2.5, (32, 32))
    mask28 = np.ones((28, 28), np.float32)
    nocs = rng.uniform(0.1, 0.9, (28, 28, 3)).astype(np.float32)
    intr = np.asarray(make_intrinsics(64.0, 64.0, 31.5, 31.5))
    return depth, box, mask28, nocs, intr


class TestGridExtract:
    def test_exact_pixel_grid_matches_direct_lookup(self):
        """With a 32x32 grid over an exactly 32x32 pixel box, the sampled
        positions are exactly the box's pixels: depth and backprojection
        must match direct indexing."""
        depth, box, mask28, nocs, intr = _scene()
        feats, valid = grid_extract(jnp.asarray(nocs), jnp.asarray(mask28),
                                    jnp.asarray(box), jnp.asarray(depth),
                                    jnp.asarray(intr), grid=32)
        feats, valid = np.asarray(feats), np.asarray(valid)
        assert valid.all()  # full box has depth and mask
        # Manual backprojection at integer pixels 16..47.
        vs, us = np.meshgrid(np.arange(16, 48), np.arange(16, 48),
                             indexing="ij")
        z = depth[vs, us]
        x = (us - 31.5) / 64.0 * z
        y = (vs - 31.5) / 64.0 * z
        manual = np.stack([x, -y, -z], -1).reshape(-1, 3)
        np.testing.assert_allclose(feats[:, :3], manual, atol=1e-5)
        # NOCS values lie in the patch's value range
        assert feats[:, 3:].min() >= 0.05 and feats[:, 3:].max() <= 0.95

    def test_mask_and_depth_gate(self):
        depth, box, mask28, nocs, intr = _scene()
        mask28[:, 14:] = 0.0  # right half of the patch masked out
        depth[16:32, 16:48] = 0.0  # top half has no depth
        feats, valid = grid_extract(jnp.asarray(nocs), jnp.asarray(mask28),
                                    jnp.asarray(box), jnp.asarray(depth),
                                    jnp.asarray(intr), grid=32)
        v = np.asarray(valid).reshape(32, 32)
        assert not v[:16].any()          # no depth
        assert not v[:, 17:].any()       # masked out (with edge tolerance)
        assert v[16:, :14].all()

    def test_out_of_image_box_clipped(self):
        depth, box, mask28, nocs, intr = _scene()
        box = np.array([-20.0, -20.0, 48.0, 48.0], np.float32)
        feats, valid = grid_extract(jnp.asarray(nocs), jnp.asarray(mask28),
                                    jnp.asarray(box), jnp.asarray(depth),
                                    jnp.asarray(intr), grid=32)
        assert np.isfinite(np.asarray(feats)).all()
        # Some samples fall outside the image -> invalid, none crash.
        assert 0 < np.asarray(valid).sum() < 32 * 32


class TestPoseEquivalence:
    @pytest.mark.parametrize("extraction", ["full", "grid"])
    def test_known_similarity_recovered(self, extraction):
        """Both extraction modes must recover a planted similarity
        transform: depth = plane, NOCS = inverse-transformed points."""
        h = w = 64
        cam = CameraConfig(height=h, width=w, fx=64.0, fy=64.0)
        pose_cfg = PoseConfig(max_points=1024, ransac_iters=32,
                              outlier_min_points=64, extraction=extraction)
        cfg = Config().replace(camera=cam, pose=pose_cfg)
        intr = make_intrinsics(cam.fx, cam.fy, cam.cx, cam.cy)

        # Camera-space points on a tilted plane inside the box.
        depth = np.zeros((h, w), np.float32)
        vs, us = np.meshgrid(np.arange(16, 48), np.arange(16, 48),
                             indexing="ij")
        z = 2.0 + 0.01 * (vs - 16)
        depth[16:48, 16:48] = z
        x = (us - float(cam.cx)) / cam.fx * z
        y = (vs - float(cam.cy)) / cam.fy * z
        pts_cam = np.stack([x, -y, -z], -1)

        # Ground-truth similarity CAD->cam: s R p + t.
        s_true = 1.7
        ang = 0.4
        R_true = np.array([[np.cos(ang), -np.sin(ang), 0],
                           [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
        t_true = np.array([0.2, -0.1, -2.2])
        nocs_pts = ((pts_cam - t_true) @ R_true) / s_true  # R^-1 = R.T
        # 32x32 CAD points -> 28x28 patch by sampling (values in [0,1]).
        patch = np.clip(nocs_pts + 0.5, 0, 1)[
            np.round(np.linspace(0, 31, 28)).astype(int)][:,
            np.round(np.linspace(0, 31, 28)).astype(int)].astype(np.float32)

        box = jnp.asarray([16.0, 16.0, 48.0, 48.0])
        mask = (jnp.ones((28, 28)) if extraction == "grid"
                else jnp.asarray(depth > 0))
        res = jax.jit(lambda *a: estimate_object_pose(*a, cfg=cfg))(
            jnp.asarray(patch), jnp.asarray(depth), jnp.eye(4),
            jnp.asarray(intr), mask, box, jax.random.PRNGKey(0))
        assert bool(res.valid)
        assert float(res.scale) == pytest.approx(s_true, rel=0.08)
        np.testing.assert_allclose(np.asarray(res.translation), t_true,
                                   atol=0.15)
