"""Siamese tracker variant, triplet loss, visualisation exports, dataset info."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from mot3d_tpu.config import TrackingConfig
from mot3d_tpu.data.synthetic import synthetic_sequence
from mot3d_tpu.models.siamese import (SiameseTracker, siamese_edge_features,
                                      triplet_loss)
from mot3d_tpu.tracking import build_graph
from mot3d_tpu.tracking.graph_builder import make_template
from mot3d_tpu.tracking.visualise import write_ply, voxel_to_obj, export_sequence

TCFG = TrackingConfig(seq_len=5, max_instances_per_frame=3, max_frame_dist=1,
                      undirected=False)


class TestSiamese:
    def test_forward_and_learning_signal(self):
        seq = synthetic_sequence(TCFG, seed=0, num_objects=2, noise=0.01)
        template = make_template(TCFG.seq_len, TCFG.max_instances_per_frame,
                                 1)
        graph = build_graph(
            template, TCFG, jnp.array(seq.det_valid),
            jnp.array(seq.translations), jnp.array(seq.rotations),
            jnp.array(seq.scales), jnp.array(seq.pred_boxes),
            jnp.array(seq.gt_boxes), jnp.array(seq.gt_ids),
            jnp.array(seq.gt_valid))
        from mot3d_tpu.config import SiameseConfig
        model = SiameseTracker(SiameseConfig())
        vox = jnp.array(seq.voxels.reshape(-1, 32, 32, 32))
        rel = siamese_edge_features(graph.edge_attr)
        assert rel.shape[-1] == 7
        params = model.init(jax.random.PRNGKey(0), vox, graph.src, graph.dst,
                            rel, graph.edge_mask)
        logits, emb = model.apply(params, vox, graph.src, graph.dst, rel,
                                  graph.edge_mask)
        assert logits.shape == graph.src.shape
        assert np.isfinite(np.asarray(logits)).all()
        assert emb is not None and emb.shape[0] == vox.shape[0]

        def loss(p):
            lg, _ = model.apply(p, vox, graph.src, graph.dst, rel,
                                graph.edge_mask)
            from mot3d_tpu.models.mpn import balanced_bce_loss
            return balanced_bce_loss(lg, graph.targets, graph.edge_mask)

        g = jax.grad(loss)(params)
        assert any(np.abs(np.asarray(x)).max() > 0
                   for x in jax.tree_util.tree_leaves(g))

    def test_triplet_loss(self):
        a = jnp.zeros((4, 8))
        pos = jnp.ones((4, 8)) * 0.1
        neg = jnp.ones((4, 8)) * 3.0
        l_good = float(triplet_loss(a, pos, neg))
        l_bad = float(triplet_loss(a, neg, pos))
        assert l_good < 0.1
        assert l_bad > 5.0


class TestVisualise:
    def test_ply_and_obj(self, tmp_path):
        pts = np.random.default_rng(0).normal(size=(10, 3))
        write_ply(str(tmp_path / "a.ply"), pts,
                  np.full((10, 3), 128, np.uint8))
        txt = open(tmp_path / "a.ply").read()
        assert "element vertex 10" in txt

        grid = np.zeros((8, 8, 8))
        grid[3, 3, 3] = 1
        voxel_to_obj(str(tmp_path / "v.obj"), grid, np.eye(3),
                     np.zeros(3), 1.0)
        txt = open(tmp_path / "v.obj").read()
        assert txt.count("v ") == 8 and txt.count("f ") == 6

    def test_export_sequence(self, tmp_path):
        trajs = [[{"scan_idx": t, "loc": np.array([t, 0.0, 0.0])}
                  for t in range(3)]]
        export_sequence(str(tmp_path / "seq"), trajs,
                        background_pc=np.zeros((5, 6)))
        assert os.path.exists(tmp_path / "seq" / "traj_000.ply")
        assert os.path.exists(tmp_path / "seq" / "background.ply")


class TestDatasetInfo:
    def test_counts(self, tmp_path):
        from mot3d_tpu.data.fixtures import write_motfront_fixture
        from mot3d_tpu.data.motfront import MOTFrontDataset
        root = str(tmp_path)
        write_motfront_fixture(root, split="train", num_scenes=2,
                               num_frames=2, num_objects=2, seed=3)
        ds = MOTFrontDataset(root, "train")
        info = ds.dataset_info()
        assert info["num_scenes"] == 2
        assert info["num_images"] == 4
        assert info["num_annotations"] == 8
        assert sum(info["class_counts"].values()) == 8
