"""Siamese (non-graph) tracker variant.

The reference's `--use_graph=False` path (`Tracking/trainer.py:33-978` +
`Tracking/datasets/siamese_dataset.py`): consecutive-frame instance pairs
only; the edge embedding is an MLP over the relative pose (7-d: dPosition,
dRotation, log-scale-ratio), concatenated with the two 12-d voxel
appearance embeddings, classified by a wider EdgeClassifier; optional
triplet loss on appearance embeddings.

TPU design: reuse the padded graph template restricted to dt == 1; all
pairs are classified in one batched pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mot3d_tpu.models.mpn import MLP, VoxelEncoder, EdgeClassifier


class SiameseTracker(nn.Module):
    """Voxel encoder (12-d, `mpn_trainer` siamese default) + relative-pose
    edge encoder MLP(7 -> [8, 8]) + classifier on [h_i, h_j, e_ij]."""

    appearance_dim: int = 12
    edge_dims: tuple = (8, 8)

    @nn.compact
    def __call__(self, voxels, src, dst, rel_pose, edge_mask):
        """voxels (N, 32, 32, 32); src/dst (E,); rel_pose (E, 7).
        Returns (E,) logits."""
        h = VoxelEncoder(self.appearance_dim, name="voxel_encoder")(voxels)
        e = MLP(self.edge_dims, name="edge_encoder")(rel_pose)
        feats = jnp.concatenate([h[src], h[dst], e], axis=-1)
        logits = EdgeClassifier(16, name="classifier")(feats)[..., 0]
        return jnp.where(edge_mask, logits, 0.0)


def siamese_edge_features(graph_edge_attr: jax.Array) -> jax.Array:
    """Relative-pose features for siamese edges: [dPos(3), dRot(3),
    log-scale(1)] — the graph builder's 8-d features without dt
    (`siamese_dataset.py` compute_edge_emb)."""
    return graph_edge_attr[..., :7]


def triplet_loss(anchor: jax.Array, positive: jax.Array,
                 negative: jax.Array, margin: float = 1.0) -> jax.Array:
    """Euclidean triplet margin loss (`Tracking/trainer.py` --use_triplet,
    nn.TripletMarginLoss(margin=1, p=2))."""
    d_pos = jnp.linalg.norm(anchor - positive, axis=-1)
    d_neg = jnp.linalg.norm(anchor - negative, axis=-1)
    return jnp.maximum(d_pos - d_neg + margin, 0.0).mean()
