"""Data layer: detection-h5 interchange, binvox codec, voxel rescale,
NOCS crop normalisation, synthetic MOTFront-format scenes."""

import os

import numpy as np
import pytest

from mot3d_tpu.data.binvox import read_binvox, write_binvox, rescale_voxel
from mot3d_tpu.data.h5_io import (
    FrameDetections,
    read_frame_h5,
    write_frame_h5,
    pad_sequence,
)

RNG = np.random.default_rng(11)


def make_frame(n=3, g=2):
    return FrameDetections(
        classes=RNG.integers(0, 7, n).astype(np.int32),
        objectness_scores=RNG.uniform(0.4, 1.0, n),
        voxels=(RNG.uniform(size=(n, 32, 32, 32)) < 0.2).astype(np.float64),
        rotations=RNG.normal(size=(n, 3)),
        translations=RNG.normal(size=(n, 3)),
        scales=RNG.uniform(0.5, 2, n),
        pred_boxes=RNG.normal(size=(n, 8, 3)),
        gt_ids=np.arange(g),
        gt_boxes=RNG.normal(size=(g, 8, 3)),
        gt_voxels=(RNG.uniform(size=(g, 32, 32, 32)) < 0.2).astype(np.float64),
        gt_rotations=RNG.normal(size=(g, 3)),
        gt_locations=RNG.normal(size=(g, 3)),
        gt_scales=RNG.uniform(0.5, 2, g),
        gt_compl_boxes=RNG.normal(size=(g, 8, 3)),
        gt_classes=RNG.integers(0, 7, g).astype(np.int32),
    )


class TestH5Interchange:
    def test_roundtrip(self, tmp_path):
        frame = make_frame()
        path = str(tmp_path / "seq" / "0.h5")
        write_frame_h5(path, frame)
        back = read_frame_h5(path)
        np.testing.assert_array_equal(back.classes, frame.classes)
        np.testing.assert_allclose(back.translations, frame.translations)
        np.testing.assert_allclose(back.pred_boxes, frame.pred_boxes)
        np.testing.assert_array_equal(back.gt_ids, frame.gt_ids)
        np.testing.assert_array_equal(back.gt_classes, frame.gt_classes)

    def test_gt_cls_stored_one_based(self, tmp_path):
        # Reference convention: on-disk gt_cls starts at 1
        # (front_dataset.py:68 subtracts 1 on read).
        import h5py
        frame = make_frame()
        path = str(tmp_path / "0.h5")
        write_frame_h5(path, frame)
        with h5py.File(path) as hf:
            raw = np.array(hf["gt_cls"])
        np.testing.assert_array_equal(raw, frame.gt_classes + 1)

    def test_empty_predictions(self, tmp_path):
        frame = make_frame(n=0)
        path = str(tmp_path / "0.h5")
        write_frame_h5(path, frame)
        back = read_frame_h5(path)
        assert back.classes.size == 0
        assert back.gt_ids.size == 2

    def test_pad_sequence(self, tmp_path):
        frames = [make_frame(n) for n in (3, 0, 5)]
        padded = pad_sequence(frames, max_instances=4, max_gt=4)
        assert padded["det_valid"].shape == (3, 4)
        assert padded["det_valid"][0].sum() == 3
        assert padded["det_valid"][1].sum() == 0
        assert padded["det_valid"][2].sum() == 4  # truncated to max_instances
        np.testing.assert_allclose(padded["translations"][0, :3],
                                   frames[0].translations)
        assert (padded["gt_ids"][0, 2:] == -1).all()

    def test_pad_sequence_frame_padding(self):
        # seq_len pads the FRAME axis with fully-invalid frames so short
        # scenes fit a longer static graph template.
        frames = [make_frame(n) for n in (2, 1)]
        padded = pad_sequence(frames, max_instances=4, max_gt=4, seq_len=5)
        assert padded["det_valid"].shape == (5, 4)
        assert padded["det_valid"][2:].sum() == 0
        assert padded["gt_valid"][2:].sum() == 0
        assert (padded["gt_ids"][2:] == -1).all()
        # seq_len shorter than the data never truncates.
        padded = pad_sequence(frames, max_instances=4, max_gt=4, seq_len=1)
        assert padded["det_valid"].shape == (2, 4)


class TestBinvox:
    def test_roundtrip(self, tmp_path):
        grid = RNG.uniform(size=(32, 32, 32)) < 0.3
        path = str(tmp_path / "model.binvox")
        write_binvox(path, grid, translate=(1, 2, 3), scale=0.5)
        back = read_binvox(path)
        np.testing.assert_array_equal(back.data, grid)
        assert back.translate == (1.0, 2.0, 3.0)
        assert back.scale == 0.5

    def test_long_runs(self, tmp_path):
        grid = np.zeros((32, 32, 32), bool)
        grid[5] = True  # a 1024-voxel run > 255
        path = str(tmp_path / "runs.binvox")
        write_binvox(path, grid)
        np.testing.assert_array_equal(read_binvox(path).data, grid)

    def test_rescale_identity(self):
        grid = (RNG.uniform(size=(32, 32, 32)) < 0.2).astype(np.int64)
        out = rescale_voxel(grid, np.array([2.0, 2.0, 2.0]))
        np.testing.assert_array_equal(out, grid.astype(np.float32))

    def test_rescale_shrinks_axis(self):
        grid = np.zeros((32, 32, 32), np.int64)
        grid[4:28, 4:28, 4:28] = 1
        out = rescale_voxel(grid, np.array([1.0, 1.0, 0.5]))
        zs = np.nonzero(out)[2]
        assert zs.min() >= 9 and zs.max() <= 22  # z extent halved about centre
        xs = np.nonzero(out)[0]
        assert xs.min() == 4 and xs.max() == 27  # x extent unchanged


class TestNocsCrop:
    def test_crop_normalise(self):
        from mot3d_tpu.data.motfront import crop_normalise_nocs
        img = np.full((240, 320, 3), 30000.0, np.float32)
        img[50:80, 100:140] = 10000.0
        mask = np.zeros((240, 320), bool)
        mask[50:80, 100:140] = True
        patch = crop_normalise_nocs(img, mask, np.array([95, 45, 145, 85]))
        assert patch.shape == (40, 50, 3)
        assert patch.min() == 0.0 and patch.max() == 1.0
        # masked pixels are the min (10000), background white is the max
        assert patch[10, 10, 0] == 0.0

    def test_all_equal_patch(self):
        from mot3d_tpu.data.motfront import crop_normalise_nocs
        img = np.zeros((240, 320, 3), np.float32)
        mask = np.zeros((240, 320), bool)  # empty mask -> all white
        patch = crop_normalise_nocs(img, mask, np.array([0, 0, 10, 10]))
        np.testing.assert_allclose(patch, 1.0)
