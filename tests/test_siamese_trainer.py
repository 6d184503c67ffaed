"""Siamese (non-graph) tracker trainer: training loop, ablations, triplet
mining, precompute path (reference `Tracking/trainer.py:33-978`,
`Tracking/datasets/siamese_dataset.py:115-283`)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mot3d_tpu.config import Config, SiameseConfig, TrackingConfig
from mot3d_tpu.data.synthetic import synthetic_sequence
from mot3d_tpu.models.siamese import (mine_triplets, siamese_bce_loss,
                                      siamese_l1_loss, triplet_loss)
from mot3d_tpu.train.siamese_trainer import SiameseTrainer


def _cfg(**siamese_kw) -> Config:
    trk = TrackingConfig(seq_len=4, max_instances_per_frame=4,
                         max_frame_dist=1)
    return Config().replace(tracking=trk,
                            siamese=SiameseConfig(**siamese_kw))


def _seqs(cfg, n, **kw):
    return [synthetic_sequence(cfg.tracking, seed=i, num_objects=3,
                               noise=0.01, **kw)._asdict() for i in range(n)]


def test_siamese_trains_and_improves():
    cfg = _cfg()
    trainer = SiameseTrainer(cfg, output_dir="out/test_siamese")
    train, val = _seqs(cfg, 6), _seqs(cfg, 2)
    trainer.init_state()
    first = trainer.validate(val)
    result = trainer.train(train, val, num_epochs=6, batch_size=2)
    assert np.isfinite(result["val_loss"])
    assert result["val_loss"] < first["val_loss"]
    assert 0.0 <= result["mota"] <= 1.0


@pytest.mark.parametrize("ablation", ["no_pose", "no_geo", "use_l1"])
def test_siamese_ablations_step(ablation):
    cfg = _cfg(**{ablation: True})
    trainer = SiameseTrainer(cfg, output_dir=f"out/test_siamese_{ablation}")
    train, val = _seqs(cfg, 4), _seqs(cfg, 1)
    result = trainer.train(train, val, num_epochs=2, batch_size=2)
    assert np.isfinite(result["val_loss"])
    # Ablations change the parameter tree (`Tracking/trainer.py:50-70`).
    names = jax.tree_util.tree_map(lambda _: None, trainer.state.params)
    flat = str(names)
    if ablation == "no_pose":
        assert "edge_encoder" not in flat and "voxel_encoder" in flat
    elif ablation == "no_geo":
        assert "voxel_encoder" not in flat and "edge_encoder" in flat


def test_siamese_triplet_trains():
    cfg = _cfg(use_triplet=True)
    trainer = SiameseTrainer(cfg, output_dir="out/test_siamese_triplet")
    train, val = _seqs(cfg, 4), _seqs(cfg, 1)
    trainer.init_state()
    step_fn = trainer._step(False)
    from mot3d_tpu.train.tracking_trainer import sequences_to_batch
    batch = sequences_to_batch(train[:2])
    losses = []
    for _ in range(6):
        trainer.state, metrics = step_fn(trainer.state, batch)
        losses.append(float(metrics["siamese_loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses


def test_invalid_ablation_combos_rejected():
    with pytest.raises(ValueError):
        SiameseTrainer(_cfg(no_pose=True, no_geo=True))
    with pytest.raises(ValueError):
        SiameseTrainer(_cfg(use_triplet=True, no_geo=True))


def test_precompute_matches_direct_training():
    """Training from cached features must equal direct training while the
    voxel encoder is frozen-by-construction within one step (the first
    step's gradients w.r.t. classifier/edge_encoder agree)."""
    cfg = _cfg()
    t1 = SiameseTrainer(cfg, output_dir="out/test_siamese_pre1")
    t2 = SiameseTrainer(cfg, output_dir="out/test_siamese_pre2")
    train = _seqs(cfg, 2)
    t1.init_state()
    t2.init_state()
    # identical initial params
    t2.state = t1.state
    from mot3d_tpu.train.tracking_trainer import sequences_to_batch
    batch = sequences_to_batch(train)

    s_direct, m_direct = t1._step(False)(t1.state, batch)
    feats = t2.precompute_features(train)
    fb = jnp.asarray(np.stack(feats))
    s_pre, m_pre = t2._step(True)(t2.state, batch, fb)
    np.testing.assert_allclose(float(m_pre["siamese_loss"]),
                               float(m_direct["siamese_loss"]), rtol=1e-5)


def test_precompute_cache_roundtrip(tmp_path):
    cfg = _cfg()
    trainer = SiameseTrainer(cfg, output_dir="out/test_siamese_cache")
    seqs = _seqs(cfg, 2)
    a = trainer.precompute_features(seqs, cache_dir=str(tmp_path))
    b = trainer.precompute_features(seqs, cache_dir=str(tmp_path))  # from disk
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_mine_triplets_hand_case():
    """2 frames, 2 slots each; ids [[5, 7], [5, 7]].  Anchor (0,0) id=5:
    positive = node 2 (id 5), negative = node 3 (id 7)."""
    h = jnp.arange(8, dtype=jnp.float32).reshape(4, 2)
    # forward dt=1 edges: (0,2) (0,3) (1,2) (1,3)
    src = jnp.array([0, 0, 1, 1], jnp.int32)
    dst = jnp.array([2, 3, 2, 3], jnp.int32)
    targets = jnp.array([1.0, 0.0, 0.0, 1.0])
    mask = jnp.ones(4, bool)
    anchor, pos, neg, valid = mine_triplets(h, src, dst, targets, mask)
    assert bool(valid[0]) and bool(valid[1])
    assert not bool(valid[2]) and not bool(valid[3])  # last frame: no edges out
    np.testing.assert_array_equal(np.asarray(pos[0]), np.asarray(h[2]))
    np.testing.assert_array_equal(np.asarray(neg[0]), np.asarray(h[3]))
    np.testing.assert_array_equal(np.asarray(pos[1]), np.asarray(h[3]))
    np.testing.assert_array_equal(np.asarray(neg[1]), np.asarray(h[2]))
    # masked-out positive kills the anchor
    mask2 = jnp.array([False, True, True, True])
    _, _, _, valid2 = mine_triplets(h, src, dst, targets, mask2)
    assert not bool(valid2[0])


def test_triplet_loss_values():
    a = jnp.zeros((2, 3))
    p = jnp.zeros((2, 3))
    n = jnp.ones((2, 3)) * 2.0  # d_neg = sqrt(12) ≈ 3.46 > margin
    v = jnp.array([True, True])
    assert float(triplet_loss(a, p, n, v, margin=1.0)) == 0.0
    # swap: positive far, negative at anchor -> loss = d_pos + margin
    loss = float(triplet_loss(a, n, p, v, margin=1.0))
    np.testing.assert_allclose(loss, np.sqrt(12) + 1.0, rtol=1e-6)
    # validity masking
    v2 = jnp.array([True, False])
    np.testing.assert_allclose(
        float(triplet_loss(a, n, p, v2, margin=1.0)), np.sqrt(12) + 1.0,
        rtol=1e-6)


def test_siamese_losses_match_reference_formulas():
    """BCE with pos_weight clamp 10 and logit clamp 100
    (`Tracking/trainer.py:819-827`); L1 on sigmoid (:815-817)."""
    logits = jnp.array([200.0, -3.0, 0.5, 1.0])
    targets = jnp.array([1.0, 0.0, 0.0, 1.0])
    mask = jnp.ones(4, bool)
    # NumPy oracle with the same clamps.
    x = np.clip(np.asarray(logits), -100, 100)
    y = np.asarray(targets)
    pw = min((4 - 2) / 2, 10.0)
    ref = np.mean(pw * y * np.logaddexp(0, -x) + (1 - y) * np.logaddexp(0, x))
    np.testing.assert_allclose(
        float(siamese_bce_loss(logits, targets, mask)), ref, rtol=1e-6)

    ref_l1 = np.mean(np.abs(1 / (1 + np.exp(-np.asarray(logits))) - y))
    np.testing.assert_allclose(
        float(siamese_l1_loss(logits, targets, mask)), ref_l1, rtol=1e-6)
