"""Golden-file tests: MOTFront-format fixture -> dataset reader -> padded
samples; the full on-disk parsing path (SURVEY.md §4)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from mot3d_tpu.config import CameraConfig, DetectionConfig
from mot3d_tpu.data.fixtures import write_motfront_fixture
from mot3d_tpu.data.motfront import MOTFrontDataset, load_depth_campose
from mot3d_tpu.data.detection_loader import load_frame, stack_samples


CAM = CameraConfig()
DCFG = DetectionConfig(max_instances=4)


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("motfront"))
    write_motfront_fixture(root, split="train", num_scenes=2, num_frames=3,
                           num_objects=2, seed=1)
    return root


class TestMOTFrontReading:
    def test_scene_listing(self, fixture_root):
        ds = MOTFrontDataset(fixture_root, "train",
                             voxel_dir=os.path.join(fixture_root, "voxels"))
        assert len(ds.scenes()) == 2

    def test_scene_structure(self, fixture_root):
        ds = MOTFrontDataset(fixture_root, "train",
                             voxel_dir=os.path.join(fixture_root, "voxels"))
        scene = ds.load_scene(ds.scenes()[0])
        assert len(scene.frames) == 3
        f0 = scene.frames[0]
        assert len(f0.annotations) == 2
        a = f0.annotations[0]
        assert a.box3d.shape == (8, 3)
        assert a.object_id >= 100
        # add_halfheight: location z replaced by half box height
        z = a.box3d[:, 2]
        np.testing.assert_allclose(a.location3d[2],
                                   (z.max() - z.min()) / 2, atol=1e-5)

    def test_depth_campose(self, fixture_root):
        ds = MOTFrontDataset(fixture_root, "train")
        scene = ds.load_scene(ds.scenes()[0])
        depth, campose = load_depth_campose(scene.frames[0].hdf5_path)
        assert depth.shape == (CAM.height, CAM.width)
        assert (depth > 0).sum() > 100
        assert campose.shape == (4, 4)
        np.testing.assert_allclose(campose[3], [0, 0, 0, 1])

    def test_load_frame_padded(self, fixture_root):
        ds = MOTFrontDataset(fixture_root, "train",
                             voxel_dir=os.path.join(fixture_root, "voxels"))
        scene = ds.load_scene(ds.scenes()[0])
        s = load_frame(ds, scene.frames[0], DCFG)
        assert s.image.shape == (DCFG.pad_height, DCFG.pad_width, 3)
        assert s.valid.sum() == 2
        assert s.masks[0].sum() > 50
        # mask and box agree
        ys, xs = np.nonzero(s.masks[0])
        x0, y0, x1, y1 = s.boxes[0]
        assert xs.min() >= x0 - 1 and xs.max() <= x1 + 1
        # voxels loaded and rescaled
        assert s.voxels[0].sum() > 100
        # NOCS patch normalised to [0, 1]
        assert 0.0 <= s.nocs[0].min() and s.nocs[0].max() <= 1.0
        assert s.nocs[0].std() > 0.01

    def test_nocs_depth_consistency(self, fixture_root):
        # Backproject the GT depth and fit the GT pose from the GT NOCS map:
        # the fixture is geometrically consistent end to end.
        import jax
        from mot3d_tpu.geometry import (backproject_depth, make_intrinsics,
                                        estimate_similarity_transform)
        from mot3d_tpu.geometry.backproject import gather_masked_values
        from mot3d_tpu.data.motfront import load_nocs_png

        ds = MOTFrontDataset(fixture_root, "train")
        scene = ds.load_scene(ds.scenes()[0])
        f = scene.frames[0]
        depth, campose = load_depth_campose(f.hdf5_path)
        nocs = load_nocs_png(f.nocs_path) / 65535.0
        K = make_intrinsics(CAM.fx, CAM.fy, CAM.cx, CAM.cy)
        a = f.annotations[0]
        from mot3d_tpu.data.motfront import polygons_to_mask
        mask = polygons_to_mask(a.segmentation, CAM.height, CAM.width)
        # Only pixels of this object (z-buffer may interleave objects).
        pts, valid = backproject_depth(jnp.array(depth), K, jnp.array(mask))
        feats = jnp.concatenate([pts, jnp.array(nocs) - 0.5], -1)
        buf, bval, _ = gather_masked_values(feats, valid, 1024)
        fit = estimate_similarity_transform(buf[:, 3:], buf[:, :3], bval,
                                            jax.random.PRNGKey(0))
        assert bool(fit.valid)
        # cam->world chained pose lands at the annotated world location
        world = np.asarray(campose[:3, :3] @ np.asarray(fit.translation)
                           + campose[:3, 3])
        gt_center = a.box3d.mean(0)
        assert np.linalg.norm(world - gt_center) < 0.25

    def test_stacking(self, fixture_root):
        ds = MOTFrontDataset(fixture_root, "train",
                             voxel_dir=os.path.join(fixture_root, "voxels"))
        scene = ds.load_scene(ds.scenes()[0])
        batch = stack_samples([load_frame(ds, fr, DCFG)
                               for fr in scene.frames[:2]])
        assert batch.image.shape[0] == 2
        assert batch.boxes.shape == (2, 4, 4)
