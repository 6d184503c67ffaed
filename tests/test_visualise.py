"""Visualisation exports: isosurface meshes (vox2mesh parity), OBJ/PLY
files, and the self-contained HTML replay (dvis 4D replay equivalent,
`Tracking/visualise/visualise.py:13-726`)."""

import json
import os

import numpy as np

from mot3d_tpu.tracking.isosurface import marching_tetrahedra, vox2mesh
from mot3d_tpu.tracking.replay import write_replay_html
from mot3d_tpu.tracking.visualise import export_sequence, voxel_to_mesh_obj


class TestIsosurface:
    def test_sphere_watertight_and_on_level(self):
        r = 20
        x, y, z = np.meshgrid(*[np.arange(r)] * 3, indexing="ij")
        d = np.sqrt((x - 9.5) ** 2 + (y - 9.5) ** 2 + (z - 9.5) ** 2)
        verts, faces = marching_tetrahedra((d < 7).astype(float), 0.5)
        assert len(faces) > 100
        rad = np.linalg.norm(verts - 9.5, axis=1)
        assert 5.5 < rad.min() and rad.max() < 8.5
        # watertight: every edge shared by exactly two faces
        e = np.sort(np.concatenate(
            [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]), axis=1)
        _, cnt = np.unique(e, axis=0, return_counts=True)
        assert (cnt == 2).all()

    def test_smooth_volume_interpolates(self):
        """Non-binary volumes must interpolate vertices onto the isolevel
        (like mcubes), not snap to cell centres."""
        r = 16
        x = np.arange(r, dtype=float)
        vol = np.broadcast_to(x[:, None, None] / r, (r, r, r))
        verts, faces = marching_tetrahedra(vol, 0.4)
        assert len(faces) > 0
        np.testing.assert_allclose(verts[:, 0], 0.4 * r, atol=1e-6)

    def test_empty_and_full(self):
        z = np.zeros((8, 8, 8))
        assert len(marching_tetrahedra(z, 0.5)[1]) == 0
        # Full grid still produces a boundary shell through vox2mesh's pad
        # (may overhang the unit box by up to one cell, 1/(res-1)).
        v, f = vox2mesh(np.ones((8, 8, 8)))
        assert len(f) > 0
        cell = 1.0 / 7
        assert (v >= -0.5 - cell - 1e-9).all()
        assert (v <= 0.5 + cell + 1e-9).all()

    def test_vox2mesh_unit_box_scaling(self):
        g = np.zeros((32, 32, 32))
        g[4:28, 4:28, 4:28] = 1
        v, _ = vox2mesh(g)
        # Cube spanning 24/32 voxels -> half-extent ~0.375 in CAD space.
        assert np.abs(np.abs(v).max() - 0.375) < 0.05


class TestExports:
    def _trajs(self):
        trajs = []
        for i in range(2):
            traj = []
            for t in range(4):
                vox = np.zeros((16, 16, 16))
                vox[4:12, 4:12, 4:12] = 1
                traj.append({
                    "scan_idx": t,
                    "loc": np.array([i * 2.0, 0.1 * t, 0.5]),
                    "euler": np.zeros(3), "scale": 1.0, "cls": i + 1,
                    "voxel": vox,
                    "box": np.zeros((8, 3)) + np.array([i * 2.0, 0.1 * t,
                                                        0.5]),
                })
            trajs.append(traj)
        return trajs

    def test_voxel_to_mesh_obj(self, tmp_path):
        g = np.zeros((16, 16, 16))
        g[4:12, 4:12, 4:12] = 1
        path = str(tmp_path / "m.obj")
        n = voxel_to_mesh_obj(path, g, np.eye(3), np.array([1.0, 2.0, 3.0]),
                              2.0)
        assert n > 0
        lines = open(path).read().splitlines()
        vs = np.array([[float(x) for x in ln.split()[1:]]
                       for ln in lines if ln.startswith("v ")])
        # centred at trans, extent = 8/16 * scale 2 = 1.0 half-extent 0.5
        np.testing.assert_allclose(vs.mean(0), [1, 2, 3], atol=0.1)
        assert np.abs(vs - [1, 2, 3]).max() < 0.65
        assert sum(ln.startswith("f ") for ln in lines) == n

    def test_replay_html_self_contained(self, tmp_path):
        trajs = self._trajs()
        path = write_replay_html(str(tmp_path / "replay.html"), trajs,
                                 gt_trajectories=trajs,
                                 background_pc=np.random.rand(10000, 3))
        html = open(path).read()
        assert "<canvas" in html and "DATA" in html
        # embedded data parses back and is subsampled
        start = html.index("const DATA = ") + len("const DATA = ")
        end = html.index(";\n", start)
        data = json.loads(html[start:end])
        assert data["seq_len"] == 4
        assert len(data["pred"]) == 2 and len(data["gt"]) == 2
        assert len(data["bg"]) <= 4000
        assert "box" in data["pred"][0]["dets"][0]

    def test_fuse_obj_shape(self):
        """fuse_obj_shape parity (`Tracking/visualise/visualise.py:619-641`):
        mean of the voxel grids re-binarised at 0.5, mean scale."""
        from mot3d_tpu.tracking.visualise import fuse_obj_shape
        trajs = self._trajs()
        # Perturb: make one frame's voxel disagree on a region -> mean 0.25
        # there (below 0.5 -> off) but 0.75 in 3/4-agreement regions (on).
        trajs[0][0]["voxel"] = np.zeros((16, 16, 16))
        trajs[0][0]["voxel"][4:8, 4:12, 4:12] = 1  # half the cube only
        trajs[0][1]["scale"] = 3.0
        shapes, scales = fuse_obj_shape(trajs)
        assert shapes[0].dtype == bool and shapes[0].shape == (16, 16, 16)
        # 4-12 cube present in all 4 frames in x 4:8, 3/4 frames in x 8:12.
        assert shapes[0][4:8, 4:12, 4:12].all()
        assert shapes[0][8:12, 4:12, 4:12].all()  # 0.75 >= 0.5
        assert not shapes[0][:4].any()
        np.testing.assert_allclose(scales[0], (3.0 + 3 * 1.0) / 4)
        np.testing.assert_allclose(scales[1], 1.0)
        # No-voxel trajectory: None shape, scale defaults.
        shapes2, scales2 = fuse_obj_shape(
            [[{"scan_idx": 0, "loc": np.zeros(3)}]])
        assert shapes2[0] is None and scales2[0] == 1.0

    def test_export_sequence_fused(self, tmp_path):
        out = str(tmp_path / "fused")
        export_sequence(out, self._trajs(), with_shapes=True,
                        fuse_shapes=True)
        names = os.listdir(out)
        fused = sorted(n for n in names if n.startswith("fused_shape_"))
        assert fused == ["fused_shape_000.obj", "fused_shape_001.obj"]
        # The replay embeds the fused point sets + per-frame rotations.
        html = open(os.path.join(out, "replay.html")).read()
        start = html.index("const DATA = ") + len("const DATA = ")
        data = json.loads(html[start:html.index(";\n", start)])
        assert data["pred"][0]["shape"], "fused shape points missing"
        assert "R" in data["pred"][0]["dets"][0]
        assert "scale" in data["pred"][0]
        # Canonical points live in [-0.5, 0.5]^3.
        pts = np.asarray(data["pred"][0]["shape"])
        assert (np.abs(pts) <= 0.5).all()

    def test_export_sequence_writes_all_artifacts(self, tmp_path):
        out = str(tmp_path / "seq")
        export_sequence(out, self._trajs(), with_shapes=True,
                        background_pc=np.random.rand(50, 3))
        names = os.listdir(out)
        assert "replay.html" in names
        assert "background.ply" in names
        assert any(n.startswith("traj_") for n in names)
        shapes = [n for n in names if n.startswith("shape_")]
        assert shapes
        # shapes are isosurface meshes (triangular faces)
        txt = open(os.path.join(out, shapes[0])).read()
        assert txt.splitlines()[-1].count(" ") == 3  # "f a b c"
