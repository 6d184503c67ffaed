"""Siamese (non-graph) tracker variant.

The reference's ``--use_graph=False`` path (`Tracking/trainer.py:33-978` +
`Tracking/datasets/siamese_dataset.py`): consecutive-frame instance pairs
only; the edge embedding is an MLP over the relative pose (7-d: log-scale,
dPosition, dRotation), concatenated with the two 12-d voxel appearance
embeddings and classified by a wider EdgeClassifier.  Ablations
(`Tracking/options.py:36-83`, network wiring `Tracking/trainer.py:50-70`):

  - ``no_pose``: drop the edge encoder; classify [h_i, h_j]   (in_dim 24)
  - ``no_geo``:  drop the voxel encoder; classify e_ij alone  (in_dim 8)
  - default:     classify [h_i, h_j, e_ij]                    (in_dim 32)
  - ``use_triplet``: triplet margin loss on appearance embeddings with
    per-anchor positive/negative mining (`siamese_dataset.py:115-283`)
  - ``use_l1``: L1 on sigmoid(logits) instead of balanced BCE
    (`Tracking/trainer.py:815-817`)

TPU design: consecutive pairs are the padded graph template restricted to
dt == 1; all pairs of a sequence are classified in one batched pass, and
triplet mining is a pair of segment-max reductions over the same padded
edge arrays instead of the reference's triple Python loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mot3d_tpu.config import SiameseConfig
from mot3d_tpu.models.mpn import MLP, VoxelEncoder, EdgeClassifier


class SiameseTracker(nn.Module):
    """Voxel encoder (12-d, `Tracking/trainer.py:48`) + relative-pose edge
    encoder MLP(7 -> [8, 8]) (`trainer.py:58`) + classifier on the
    ablation-dependent concat (`trainer.py:56-67`)."""

    cfg: SiameseConfig

    def setup(self):
        c = self.cfg
        if not c.no_geo:
            self.voxel_encoder = VoxelEncoder(c.appearance_dim,
                                              name="voxel_encoder")
        if not c.no_pose:
            self.edge_encoder = MLP((8, c.edge_out_dim), name="edge_encoder")
        self.classifier = EdgeClassifier(c.classifier_intermed_dim,
                                         name="classifier")

    def encode(self, voxels):
        """Appearance embeddings (N, appearance_dim) — the precomputable
        part (`Tracking/trainer.py:396-449` precompute_features)."""
        if self.cfg.no_geo:
            raise ValueError("no_geo model has no voxel encoder")
        return self.voxel_encoder(voxels)

    def classify(self, h, src, dst, rel_pose, edge_mask):
        """Classify consecutive-frame pairs from (pre)computed embeddings.

        h (N, D) or None (no_geo); src/dst (E,); rel_pose (E, 7).
        Returns (E,) logits (masked slots zeroed).
        """
        c = self.cfg
        feats = []
        if not c.no_geo:
            feats += [h[src], h[dst]]
        if not c.no_pose:
            feats.append(self.edge_encoder(rel_pose))
        logits = self.classifier(jnp.concatenate(feats, axis=-1))[..., 0]
        return jnp.where(edge_mask, logits, 0.0)

    def __call__(self, voxels, src, dst, rel_pose, edge_mask):
        """voxels (N, 32, 32, 32); src/dst (E,); rel_pose (E, 7).
        Returns ((E,) logits, (N, D) embeddings or None)."""
        h = None if self.cfg.no_geo else self.encode(voxels)
        return self.classify(h, src, dst, rel_pose, edge_mask), h


def siamese_edge_features(graph_edge_attr: jax.Array) -> jax.Array:
    """Relative-pose features for siamese edges: [dPos(3), dRot(3),
    log-scale(1)] — the graph builder's 8-d features without dt
    (`siamese_dataset.py:8-41` compute_edge_emb builds the same 7 values)."""
    return graph_edge_attr[..., :7]


def siamese_bce_loss(logits, targets, mask, pos_weight_max: float = 10.0,
                     logit_clamp: float = 100.0):
    """Balanced BCE with pos_weight = #neg/#pos clamped at 10 and logits
    clamped to +-100 (`Tracking/trainer.py:807-829`)."""
    mask_f = mask.astype(logits.dtype)
    targets = targets.astype(logits.dtype)
    logits = jnp.clip(logits, -logit_clamp, logit_clamp)
    num_all = jnp.maximum(mask_f.sum(), 1.0)
    num_pos = (targets * mask_f).sum()
    pos_weight = jnp.where(
        num_pos > 0,
        jnp.minimum((num_all - num_pos) / jnp.maximum(num_pos, 1.0),
                    pos_weight_max),
        1.0)
    per_edge = (pos_weight * targets * jax.nn.softplus(-logits)
                + (1.0 - targets) * jax.nn.softplus(logits))
    return (per_edge * mask_f).sum() / num_all


def siamese_l1_loss(logits, targets, mask):
    """L1 on sigmoid(logits) (`Tracking/trainer.py:815-817`,
    nn.L1Loss(reduction='mean') over valid pairs)."""
    mask_f = mask.astype(logits.dtype)
    err = jnp.abs(jax.nn.sigmoid(logits) - targets.astype(logits.dtype))
    return (err * mask_f).sum() / jnp.maximum(mask_f.sum(), 1.0)


def mine_triplets(h, src, dst, targets, edge_mask):
    """Per-anchor positive/negative mining on padded consecutive-pair edges.

    Mirrors `siamese_dataset.py:115-283`: for each instance n of frame t the
    anchor is its embedding, the positive is the (last) same-identity match
    in frame t+1 and the negative the (last) different-identity instance in
    frame t+1; a triplet is emitted only when both exist.  Here "last in
    loop order" = segment-max of the edge index grouped by source node.

    h (N, D); src/dst (E,) over FORWARD dt==1 edges only; targets (E,) in
    {0,1}; edge_mask (E,) bool.  Returns (anchor, positive, negative) each
    (N, D) plus a (N,) validity mask.
    """
    n = h.shape[0]
    e_idx = jnp.arange(src.shape[0], dtype=jnp.int32)
    neg_one = jnp.full_like(e_idx, -1)
    pos_sel = jnp.where(jnp.logical_and(edge_mask, targets > 0.5),
                        e_idx, neg_one)
    neg_sel = jnp.where(jnp.logical_and(edge_mask, targets < 0.5),
                        e_idx, neg_one)
    pos_edge = jax.ops.segment_max(pos_sel, src, num_segments=n)
    neg_edge = jax.ops.segment_max(neg_sel, src, num_segments=n)
    valid = jnp.logical_and(pos_edge >= 0, neg_edge >= 0)
    positive = h[dst[jnp.maximum(pos_edge, 0)]]
    negative = h[dst[jnp.maximum(neg_edge, 0)]]
    return h, positive, negative, valid


def triplet_loss(anchor: jax.Array, positive: jax.Array,
                 negative: jax.Array, valid=None,
                 margin: float = 1.0) -> jax.Array:
    """Euclidean triplet margin loss (`Tracking/trainer.py:91-94,833-840`,
    nn.TripletMarginLoss(margin=1, p=2)), masked mean over valid anchors.

    Distances use an epsilon-regularised sqrt: padded (masked-out) anchors
    can pair identical embeddings, and d/dx sqrt(x) at 0 is inf — the mask
    zeroes the forward value but 0 * inf = NaN in the backward pass."""
    def dist(a, b):
        return jnp.sqrt(jnp.sum(jnp.square(a - b), axis=-1) + 1e-12)
    d_pos = dist(anchor, positive)
    d_neg = dist(anchor, negative)
    per = jnp.maximum(d_pos - d_neg + margin, 0.0)
    if valid is None:
        return per.mean()
    v = valid.astype(per.dtype)
    return (per * v).sum() / jnp.maximum(v.sum(), 1.0)
