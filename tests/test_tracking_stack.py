"""Graph builder + MPN + tracker + MOT metrics: the minimum end-to-end slice."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mot3d_tpu.config import TrackingConfig, GraphConfig
from mot3d_tpu.data.synthetic import synthetic_sequence
from mot3d_tpu.models import TrackerModel
from mot3d_tpu.models.mpn import balanced_bce_loss, tracker_loss
from mot3d_tpu.tracking import Tracker, build_graph
from mot3d_tpu.tracking.graph_builder import make_template
from mot3d_tpu.tracking.mot_metrics import (
    MOTAccumulator,
    norm2squared_matrix,
    mot_summary,
)

# Small configs for fast tests.
TCFG = TrackingConfig(seq_len=8, max_instances_per_frame=4, max_frame_dist=3)
GCFG = GraphConfig()


def build_test_graph(seed=0, **kw):
    seq = synthetic_sequence(TCFG, seed=seed, num_objects=3, **kw)
    template = make_template(TCFG.seq_len, TCFG.max_instances_per_frame,
                             TCFG.max_frame_dist)
    graph = build_graph(
        template, TCFG,
        jnp.array(seq.det_valid), jnp.array(seq.translations),
        jnp.array(seq.rotations), jnp.array(seq.scales),
        jnp.array(seq.pred_boxes), jnp.array(seq.gt_boxes),
        jnp.array(seq.gt_ids), jnp.array(seq.gt_valid))
    return seq, template, graph


class TestTemplate:
    def test_edge_count(self):
        t = make_template(8, 4, 3)
        # pairs: sum_t min(3, 7-t) for t in 0..6 = 3*5 + 2 + 1 = 18; x 16
        assert len(t.src_frame) == 18 * 16
        assert (t.dt >= 1).all() and (t.dt <= 3).all()
        assert ((t.dst_frame - t.src_frame) == t.dt).all()


class TestGraphBuilder:
    def test_targets_match_identity(self):
        seq, template, graph = build_test_graph()
        src_f, src_s = template.src_frame, template.src_slot
        dst_f, dst_s = template.dst_frame, template.dst_slot
        obj_ids = np.asarray(graph.obj_ids)
        e = len(src_f)
        mask = np.asarray(graph.edge_mask)[:e]
        targets = np.asarray(graph.targets)[:e]
        for k in range(e):
            if not mask[k]:
                continue
            id1 = obj_ids[src_f[k], src_s[k]]
            id2 = obj_ids[dst_f[k], dst_s[k]]
            assert id1 >= 0 and id2 >= 0
            assert targets[k] == float(id1 == id2)

    def test_identity_matching_correct(self):
        # With tiny noise every valid detection k matches GT object k.
        seq, _, graph = build_test_graph(noise=0.01, fp_prob=0.0, drop_prob=0.0)
        obj_ids = np.asarray(graph.obj_ids)
        for t in range(TCFG.seq_len):
            for i in range(TCFG.max_instances_per_frame):
                if seq.det_valid[t, i]:
                    assert obj_ids[t, i] == seq.gt_ids[t, i]

    def test_false_positive_detection_excluded(self):
        seq, template, graph = build_test_graph(seed=3, fp_prob=1.0)
        obj_ids = np.asarray(graph.obj_ids)
        fp_mask = seq.det_valid & (np.abs(seq.translations) > 4.9).any(-1)
        assert fp_mask.sum() > 0
        assert (obj_ids[fp_mask] == -1).all()
        assert int(graph.false_positives) == int(fp_mask.sum())
        # No graph edge touches an FP detection.
        e = len(template.src_frame)
        mask = np.asarray(graph.edge_mask)[:e]
        for k in np.nonzero(mask)[0]:
            assert not fp_mask[template.src_frame[k], template.src_slot[k]]
            assert not fp_mask[template.dst_frame[k], template.dst_slot[k]]

    def test_edge_features(self):
        seq, template, graph = build_test_graph(noise=0.0, drop_prob=0.0,
                                                fp_prob=0.0)
        attr = np.asarray(graph.edge_attr)
        e = len(template.src_frame)
        k = int(np.nonzero(np.asarray(graph.edge_mask)[:e])[0][0])
        t, i = template.src_frame[k], template.src_slot[k]
        t2, j = template.dst_frame[k], template.dst_slot[k]
        np.testing.assert_allclose(
            attr[k, :3], seq.translations[t2, j] - seq.translations[t, i],
            atol=1e-5)
        np.testing.assert_allclose(
            attr[k, 3:6], seq.rotations[t2, j] - seq.rotations[t, i], atol=1e-5)
        np.testing.assert_allclose(
            attr[k, 6], np.log(seq.scales[t2, j] / seq.scales[t, i]), atol=1e-5)
        assert attr[k, 7] == template.dt[k]
        # Undirected duplicate keeps identical features (graph_dataset.py:206).
        np.testing.assert_allclose(attr[e + k], attr[k], atol=0)

    def test_jit_vmap(self):
        template = make_template(TCFG.seq_len, TCFG.max_instances_per_frame,
                                 TCFG.max_frame_dist)
        seqs = [synthetic_sequence(TCFG, seed=s, num_objects=3) for s in range(3)]
        stack = lambda f: jnp.stack([jnp.array(getattr(s, f)) for s in seqs])
        fn = jax.jit(jax.vmap(
            lambda dv, tr, ro, sc, pb, gb, gi, gv: build_graph(
                template, TCFG, dv, tr, ro, sc, pb, gb, gi, gv)))
        graphs = fn(stack("det_valid"), stack("translations"),
                    stack("rotations"), stack("scales"), stack("pred_boxes"),
                    stack("gt_boxes"), stack("gt_ids"), stack("gt_valid"))
        assert graphs.edge_attr.shape[0] == 3


class TestMPN:
    def test_forward_shapes_and_step_count(self):
        seq, template, graph = build_test_graph()
        model = TrackerModel(GCFG)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.array(seq.voxels.reshape(-1, 32, 32, 32)),
                            graph.src, graph.dst, graph.edge_attr,
                            graph.edge_mask)
        logits = model.apply(params,
                             jnp.array(seq.voxels.reshape(-1, 32, 32, 32)),
                             graph.src, graph.dst, graph.edge_attr,
                             graph.edge_mask)
        # steps 2..4 classified -> 3 outputs (graph_cfg num_mp_steps=4)
        assert logits.shape == (GCFG.num_mp_steps - 1, graph.src.shape[0])
        assert np.isfinite(np.asarray(logits)).all()

    def test_padding_invariance(self):
        # Changing features of masked-out edges must not change valid logits.
        seq, template, graph = build_test_graph()
        vox = jnp.array(seq.voxels.reshape(-1, 32, 32, 32))
        model = TrackerModel(GCFG)
        params = model.init(jax.random.PRNGKey(0), vox, graph.src, graph.dst,
                            graph.edge_attr, graph.edge_mask)
        logits1 = model.apply(params, vox, graph.src, graph.dst,
                              graph.edge_attr, graph.edge_mask)
        garbage = jnp.where(graph.edge_mask[:, None], graph.edge_attr, 77.0)
        logits2 = model.apply(params, vox, graph.src, graph.dst, garbage,
                              graph.edge_mask)
        m = np.asarray(graph.edge_mask)
        # Invalid-edge features leak into node aggregation only if the mask is
        # ignored; valid-edge logits must be identical.
        np.testing.assert_allclose(np.asarray(logits1)[:, m],
                                   np.asarray(logits2)[:, m], atol=1e-5)

    def test_loss_and_gradients(self):
        seq, template, graph = build_test_graph()
        vox = jnp.array(seq.voxels.reshape(-1, 32, 32, 32))
        model = TrackerModel(GCFG)
        params = model.init(jax.random.PRNGKey(0), vox, graph.src, graph.dst,
                            graph.edge_attr, graph.edge_mask)

        def loss_fn(p):
            logits = model.apply(p, vox, graph.src, graph.dst,
                                 graph.edge_attr, graph.edge_mask)
            return tracker_loss(logits, graph.targets, graph.edge_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        assert any(np.abs(np.asarray(g)).max() > 0 for g in flat)

    def test_training_learns_synthetic(self):
        # A few Adam steps on the graph net + classifier (precomputed node
        # features -- 3D convs are too slow for a CPU training loop) should
        # drive balanced BCE well below its starting point.
        import optax
        from mot3d_tpu.models import MPGraph, EdgeClassifier
        from flax import linen as fnn

        seq, template, graph = build_test_graph(noise=0.01)

        class GraphOnly(fnn.Module):
            @fnn.compact
            def __call__(self, x, src, dst, attr, mask):
                states = MPGraph(GCFG)(x, src, dst, attr, mask)
                clf = EdgeClassifier(GCFG.classifier_intermed_dim)
                return jnp.stack([clf(s)[..., 0] for s in states])

        n = TCFG.seq_len * TCFG.max_instances_per_frame
        feats = jax.random.normal(jax.random.PRNGKey(7), (n, GCFG.node_dim))
        model = GraphOnly()
        params = model.init(jax.random.PRNGKey(0), feats, graph.src,
                            graph.dst, graph.edge_attr, graph.edge_mask)
        opt = optax.adam(1e-2)
        state = opt.init(params)

        @jax.jit
        def step(p, s):
            def loss_fn(p):
                logits = model.apply(p, feats, graph.src, graph.dst,
                                     graph.edge_attr, graph.edge_mask)
                return tracker_loss(logits, graph.targets, graph.edge_mask)
            loss, g = jax.value_and_grad(loss_fn)(p)
            up, s = opt.update(g, s)
            return optax.apply_updates(p, up), s, loss

        first = None
        for it in range(80):
            params, state, loss = step(params, state)
            if first is None:
                first = float(loss)
        assert float(loss) < first * 0.5

    def test_time_aware_variant(self):
        seq, template, graph = build_test_graph()
        gcfg = dataclasses.replace(GCFG, time_aware_mp=True)
        vox = jnp.array(seq.voxels.reshape(-1, 32, 32, 32))
        model = TrackerModel(gcfg)
        params = model.init(jax.random.PRNGKey(0), vox, graph.src, graph.dst,
                            graph.edge_attr, graph.edge_mask)
        logits = model.apply(params, vox, graph.src, graph.dst,
                             graph.edge_attr, graph.edge_mask)
        assert np.isfinite(np.asarray(logits)).all()


class TestBalancedBCE:
    def test_matches_manual_pos_weight(self):
        logits = jnp.array([0.5, -1.0, 2.0, 0.0])
        targets = jnp.array([1.0, 0.0, 0.0, 1.0])
        mask = jnp.ones(4, bool)
        ours = float(balanced_bce_loss(logits, targets, mask))
        # manual: pos_weight = 2/2 = 1 -> plain BCE mean
        import scipy.special as sp
        x, y = np.asarray(logits), np.asarray(targets)
        ref = np.mean(y * np.log1p(np.exp(-x)) + (1 - y) * np.log1p(np.exp(x)))
        np.testing.assert_allclose(ours, ref, rtol=1e-6)

    def test_mask_excludes(self):
        logits = jnp.array([0.5, 100.0])
        targets = jnp.array([1.0, 0.0])
        m1 = jnp.array([True, False])
        l1 = float(balanced_bce_loss(logits, targets, m1))
        l2 = float(balanced_bce_loss(logits[:1], targets[:1],
                                     jnp.ones(1, bool)))
        np.testing.assert_allclose(l1, l2, rtol=1e-6)


class TestMOTAccumulator:
    def test_perfect_tracking(self):
        acc = MOTAccumulator()
        for t in range(5):
            d = norm2squared_matrix(np.zeros((2, 3)),
                                    np.zeros((2, 3)) + 0.01, 0.4)
            acc.update([1, 2], [10, 20], d)
        s = acc.summary()
        assert s["mota"] == 1.0
        assert s["num_switches"] == 0

    def test_switch_detected(self):
        acc = MOTAccumulator()
        a, b = np.array([[0, 0, 0.0]]), np.array([[5, 0, 0.0]])
        # frame 0: gt1->hypA, gt2->hypB
        d = norm2squared_matrix(np.vstack([a, b]), np.vstack([a, b]), 0.4)
        acc.update([1, 2], ["A", "B"], d)
        # frame 1: hypotheses swap positions -> SWITCHes
        d = norm2squared_matrix(np.vstack([a, b]), np.vstack([b, a]), 0.4)
        acc.update([1, 2], ["A", "B"], d)
        s = acc.summary()
        assert s["num_switches"] == 2

    def test_miss_and_fp(self):
        acc = MOTAccumulator()
        d = norm2squared_matrix(np.array([[0, 0, 0.0]]),
                                np.array([[9, 9, 9.0]]), 0.4)
        acc.update([1], ["A"], d)  # gated out -> MISS + FP
        s = acc.summary()
        assert s["num_misses"] == 1 and s["num_false_positives"] == 1
        assert s["mota"] == -1.0

    def test_continuity_preferred_over_hungarian(self):
        # Established match kept even when a closer new hypothesis appears.
        acc = MOTAccumulator()
        g = np.array([[0, 0, 0.0]])
        acc.update([1], ["A"], norm2squared_matrix(g, np.array([[0.1, 0, 0]]), 0.4))
        d = norm2squared_matrix(g, np.array([[0.3, 0, 0], [0.01, 0, 0]]), 0.4)
        acc.update([1], ["A", "B"], d)
        s = acc.summary()
        assert s["num_switches"] == 0
        assert s["num_false_positives"] == 1  # B unmatched


class TestEndToEndTrackingSlice:
    def test_oracle_edges_give_high_mota(self):
        # With ground-truth edge predictions the assembled trajectories match
        # GT almost perfectly (drops only).
        seq, template, graph = build_test_graph(noise=0.01, drop_prob=0.05,
                                                fp_prob=0.2)
        e = len(template.src_frame)
        probs = np.asarray(graph.targets)[:e]  # oracle classifier
        tracker = Tracker(TCFG)
        pred = tracker.assemble(template, probs, np.asarray(graph.obj_ids),
                                seq.det_valid, seq.translations, seq.classes)
        gt = tracker.gt_trajectories(seq.gt_ids, seq.gt_valid,
                                     seq.gt_locations, seq.gt_classes)
        summary = tracker.evaluate(pred, gt)
        assert summary["mota"] > 0.7
        assert summary["num_switches"] == 0

    def test_zero_edges_give_low_mota(self):
        seq, template, graph = build_test_graph()
        e = len(template.src_frame)
        probs = np.zeros(e)
        tracker = Tracker(TCFG)
        pred = tracker.assemble(template, probs, np.asarray(graph.obj_ids),
                                seq.det_valid, seq.translations, seq.classes)
        gt = tracker.gt_trajectories(seq.gt_ids, seq.gt_valid,
                                     seq.gt_locations, seq.gt_classes)
        summary = tracker.evaluate(pred, gt)
        assert summary["recall"] < 0.2

    def test_classwise(self):
        seq, template, graph = build_test_graph(noise=0.01)
        e = len(template.src_frame)
        probs = np.asarray(graph.targets)[:e]
        tracker = Tracker(TCFG)
        pred = tracker.assemble(template, probs, np.asarray(graph.obj_ids),
                                seq.det_valid, seq.translations, seq.classes)
        gt = tracker.gt_trajectories(seq.gt_ids, seq.gt_valid,
                                     seq.gt_locations, seq.gt_classes)
        overall, per_class = tracker.evaluate(pred, gt, classwise=True)
        assert len(per_class) >= 1
        assert all("mota" in v for v in per_class.values())


class TestMOTAccumulatorEdgeCases:
    def test_match_memory_survives_absence(self):
        # motmetrics semantics: an object's last match persists across
        # frames where it is absent; re-matching to the same hypothesis is
        # a MATCH, to a different one a SWITCH.
        acc = MOTAccumulator()
        p = np.array([[0, 0, 0.0]])
        acc.update([1], ["A"], norm2squared_matrix(p, p, 0.4))
        acc.update([], [], np.zeros((0, 0)))           # object absent
        acc.update([1], ["A"], norm2squared_matrix(p, p, 0.4))
        assert acc.summary()["num_switches"] == 0
        acc.update([1], ["B"], norm2squared_matrix(p, p, 0.4))
        assert acc.summary()["num_switches"] == 1

    def test_hungarian_minimises_total(self):
        # Two GT, two hyps; greedy nearest would mis-assign, Hungarian not.
        acc = MOTAccumulator()
        gt = np.array([[0, 0, 0.0], [0.3, 0, 0]])
        hyp = np.array([[0.25, 0, 0.0], [0.5, 0, 0]])
        acc.update([1, 2], ["A", "B"], norm2squared_matrix(gt, hyp, 1.0))
        s = acc.summary()
        assert s["num_matches"] == 2 and s["num_misses"] == 0

    def test_accumulated_mota_weighting(self):
        from mot3d_tpu.tracking.mot_metrics import accumulated_mota
        s1 = {"num_misses": 0, "num_false_positives": 0, "num_switches": 0,
              "num_objects": 10}
        s2 = {"num_misses": 5, "num_false_positives": 0, "num_switches": 0,
              "num_objects": 5}
        # dataset-level MOTA weights by object count: 1 - 5/15
        np.testing.assert_allclose(accumulated_mota([s1, s2]), 1 - 5 / 15)


class TestRansacDeterminism:
    def test_same_key_same_result(self):
        from mot3d_tpu.geometry import estimate_similarity_transform
        rng = np.random.default_rng(0)
        src = jnp.asarray(rng.uniform(-0.5, 0.5, (128, 3)), jnp.float32)
        tgt = 1.3 * src + jnp.asarray([0.1, 0.2, 0.3])
        v = jnp.ones(128, bool)
        f1 = estimate_similarity_transform(src, tgt, v, jax.random.PRNGKey(7))
        f2 = estimate_similarity_transform(src, tgt, v, jax.random.PRNGKey(7))
        np.testing.assert_array_equal(np.asarray(f1.scale), np.asarray(f2.scale))
        np.testing.assert_array_equal(np.asarray(f1.rotation),
                                      np.asarray(f2.rotation))


class TestIDF1:
    """IDF1 (Ristani et al.) from the accumulator's global ID assignment."""

    def test_perfect_tracking_is_one(self):
        acc = MOTAccumulator()
        g = np.array([[0, 0, 0], [1, 0, 0]], float)
        for _ in range(3):
            acc.update([1, 2], ["a", "b"], norm2squared_matrix(g, g, 0.4))
        assert acc.summary()["idf1"] == 1.0

    def test_identity_swap_halves_idf1(self):
        # One object, tracked by hyp a for 2 frames then hyp b for 2: the
        # best global pair covers 2 of 4 frames on both sides -> 0.5.
        acc = MOTAccumulator()
        one = np.array([[0, 0, 0]], float)
        for t in range(4):
            hyp = "a" if t < 2 else "b"
            acc.update([1], [hyp], norm2squared_matrix(one, one, 0.4))
        s = acc.summary()
        assert s["num_switches"] == 1
        assert abs(s["idf1"] - 0.5) < 1e-12

    def test_false_positive_lowers_idf1(self):
        acc = MOTAccumulator()
        one = np.array([[0, 0, 0]], float)
        hyps = np.array([[0, 0, 0], [9, 9, 9]], float)
        for _ in range(2):
            acc.update([1], ["a", "fp"], norm2squared_matrix(one, hyps, 0.4))
        # IDTP=2, gt dets=2, hyp dets=4 -> 2*2/6.
        assert abs(acc.summary()["idf1"] - 2 * 2 / 6) < 1e-12

    def test_empty_is_one(self):
        assert MOTAccumulator().summary()["idf1"] == 1.0


class TestAssembleEquivalence:
    """The vectorised Tracker.assemble must match a per-edge transcription
    of the greedy algorithm (tracking_front.py:319-383) on random inputs."""

    @staticmethod
    def _assemble_oracle(template, edge_probs, obj_ids, det_valid,
                         translations, classes, thresh):
        T, I = det_valid.shape
        per_frame = [[] for _ in range(T)]

        def det(t, i):
            return {"scan_idx": t, "obj_idx": int(obj_ids[t, i]),
                    "loc": np.asarray(translations[t, i], np.float64),
                    "cls": int(classes[t, i])}

        consec = template.dt == 1
        pos = edge_probs >= thresh
        for e in np.nonzero(consec & pos)[0]:
            t, i = int(template.src_frame[e]), int(template.src_slot[e])
            t2, j = int(template.dst_frame[e]), int(template.dst_slot[e])
            if not (det_valid[t, i] and det_valid[t2, j]):
                continue
            if obj_ids[t, i] < 0 or obj_ids[t2, j] < 0:
                continue
            per_frame[t].append(det(t, i))
            per_frame[t2].append(det(t2, j))
        for t in range(T - 1):
            if det_valid[t + 1].any():
                continue
            for i in np.nonzero(det_valid[t])[0]:
                if obj_ids[t, int(i)] >= 0:
                    per_frame[t].append(det(t, int(i)))

        trajectories = []
        for t in range(T):
            used = set()
            for d in per_frame[t]:
                oid = d["obj_idx"]
                if oid in used:
                    continue
                placed = False
                for traj in trajectories:
                    if traj[0]["obj_idx"] == oid:
                        if traj[-1]["scan_idx"] != t:
                            traj.append(d)
                        placed = True
                        break
                if not placed:
                    trajectories.append([d])
                used.add(oid)
        return trajectories

    def test_matches_per_edge_oracle_randomised(self):
        template = make_template(TCFG.seq_len, TCFG.max_instances_per_frame,
                                 TCFG.max_frame_dist)
        e = len(template.src_frame)
        T, I = TCFG.seq_len, TCFG.max_instances_per_frame
        tracker = Tracker(TCFG)
        for seed in range(20):
            r = np.random.default_rng(seed)
            probs = r.uniform(size=e)
            det_valid = r.uniform(size=(T, I)) < 0.7
            # Identities including FPs (-1) and duplicate ids in a frame.
            obj_ids = r.integers(-1, 4, size=(T, I))
            translations = r.normal(size=(T, I, 3))
            classes = r.integers(0, 3, size=(T, I))
            got = tracker.assemble(template, probs, obj_ids, det_valid,
                                   translations, classes)
            want = self._assemble_oracle(template, probs, obj_ids, det_valid,
                                         translations, classes,
                                         tracker.cfg.edge_threshold)
            assert len(got) == len(want), seed
            for a, b in zip(got, want):
                assert len(a) == len(b), seed
                for da, db in zip(a, b):
                    assert da["scan_idx"] == db["scan_idx"], seed
                    assert da["obj_idx"] == db["obj_idx"], seed
                    assert da["cls"] == db["cls"], seed
                    np.testing.assert_array_equal(da["loc"], db["loc"])

    def test_template_longer_than_sequence_raises(self):
        # A 25-frame template over 8-frame arrays must fail loudly, not
        # index-clamp (the CLI avoids this by frame-padding, cli.py
        # _pad_h5_sequences).
        import pytest
        template = make_template(TCFG.seq_len, TCFG.max_instances_per_frame,
                                 TCFG.max_frame_dist)
        e = len(template.src_frame)
        T, I = TCFG.seq_len - 1, TCFG.max_instances_per_frame
        tracker = Tracker(TCFG)
        with pytest.raises(ValueError, match="template spans"):
            tracker.assemble(template, np.zeros(e), np.zeros((T, I), int),
                             np.zeros((T, I), bool), np.zeros((T, I, 3)),
                             np.zeros((T, I), int))
