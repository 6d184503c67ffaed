"""Tracker networks: voxel encoder, message-passing graph net, edge classifier.

Re-design of `Tracking/networks/` for TPU: the graph is a *dense padded edge
tensor* with validity masks (static shapes) instead of torch_geometric's
dynamic edge lists, and node aggregation uses XLA segment ops instead of
torch_scatter CUDA kernels.  vmap over a batch of sequence-graphs gives
batched training for free.

Architecture parity (shapes from `Tracking/graph_cfg.py:3-35`):
  - VoxelEncoder (`Tracking/networks/voxel_encoder.py:5-42`): 3D CNN
    32^3 -> strided convs (8,16,32,32 ch) -> FC 2048->256->out.
  - MPGraph (`Tracking/networks/mpn.py:119-254`): edge-encoder MLP 8->[12]->12;
    4 message-passing steps; per step the edge MLP updates e_ij from
    [h_i, h_j, e_init || e_ij] (initial-edge reattachment) and the node MLP
    updates h_i from [h_i, mean of incident updated edges]; edge features of
    steps 2..4 are returned for multi-step deep supervision.
  - TimeAwareNodeModel (`mpn.py:74-102`): separate past/future flow MLPs
    split by edge direction (src < dst), concatenated then fused.
  - EdgeClassifier (`Tracking/networks/edge_classifier.py:9-24`):
    2-layer MLP -> 1 logit.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mot3d_tpu.config import GraphConfig
from mot3d_tpu.ops.segment import segment_mean, segment_max, segment_sum


class MLP(nn.Module):
    """Linear stack with LeakyReLU (no activation on a 1-dim output layer),
    as `Tracking/networks/mlp.py:4-34`.  Dropout/batchnorm are unused by the
    reference's graph config and intentionally omitted."""

    fc_dims: Sequence[int]
    use_leaky_relu: bool = True

    @nn.compact
    def __call__(self, x):
        for dim in self.fc_dims:
            x = nn.Dense(dim)(x)
            if dim != 1:
                x = (jax.nn.leaky_relu(x) if self.use_leaky_relu
                     else jax.nn.relu(x))
        return x


class VoxelEncoder(nn.Module):
    """3D conv encoder for 32^3 occupancy grids -> appearance embedding.

    Input (..., 32, 32, 32) or (..., 32, 32, 32, 1); NDHWC layout (TPU).
    """

    out_dim: int = 16

    @nn.compact
    def __call__(self, vox):
        if vox.shape[-1] != 1:
            vox = vox[..., None]
        x = vox.astype(jnp.float32)
        x = nn.Conv(8, (3, 3, 3), padding=1)(x)
        x = nn.Conv(16, (3, 3, 3), strides=2, padding=1)(jax.nn.relu(x))
        x = nn.Conv(32, (3, 3, 3), strides=2, padding=1)(jax.nn.relu(x))
        x = nn.Conv(32, (3, 3, 3), strides=2, padding=1)(jax.nn.relu(x))
        x = x.reshape(x.shape[:-4] + (32 * 4 * 4 * 4,))
        x = nn.Dense(256)(jax.nn.leaky_relu(x))
        x = nn.Dense(self.out_dim)(jax.nn.leaky_relu(x))
        return x


class EdgeClassifier(nn.Module):
    """Binary active/non-active edge classifier -> logits (..., 1)."""

    intermed_dim: int = 8

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(nn.Dense(self.intermed_dim)(x))
        return nn.Dense(1)(x)


def _aggregate(name: str, data, seg_ids, num_segments, mask):
    if name == "mean":
        return segment_mean(data, seg_ids, num_segments, mask)
    if name == "max":
        return segment_max(data, seg_ids, num_segments, mask)
    if name == "sum":
        return segment_sum(data, seg_ids, num_segments, mask)
    raise ValueError(f"unknown node_agg_fn {name!r}")


class MPGraph(nn.Module):
    """Dense-padded message-passing network.

    Call signature:
        node_feats: (N, node_dim)   initial node embeddings (voxel features)
        src, dst:   (E,) int32      edge endpoints (already includes both
                                    directions for an undirected graph)
        edge_attr:  (E, edge_in)    raw edge features
        edge_mask:  (E,) bool       validity of each padded edge slot
    Returns: list of (E, edge_out_dim) edge embeddings after steps 2..S.
    """

    cfg: GraphConfig

    @nn.compact
    def __call__(self, node_feats, src, dst, edge_attr, edge_mask):
        g = self.cfg
        act = jax.nn.leaky_relu if g.use_leaky_relu else jax.nn.relu
        num_nodes = node_feats.shape[0]

        # Independent encoders.
        e = MLP(tuple(g.edge_fc_dims) + (g.edge_out_dim,),
                g.use_leaky_relu, name="edge_encoder")(edge_attr)
        h = act(node_feats)
        e0, h0 = e, h

        edge_mlp = MLP(tuple(g.edge_model_fc_dims), g.use_leaky_relu,
                       name="edge_model")
        if g.time_aware_mp:
            flow_in_mlp = MLP(tuple(g.node_model_fc_dims), g.use_leaky_relu,
                              name="flow_in")
            flow_out_mlp = MLP(tuple(g.node_model_fc_dims), g.use_leaky_relu,
                               name="flow_out")
            fuse_mlp = MLP(tuple(g.node_model_fc_dims), g.use_leaky_relu,
                           name="node_fuse")
        else:
            node_mlp = MLP(tuple(g.node_model_fc_dims), g.use_leaky_relu,
                           name="node_model")

        outputs = []
        for step in range(1, g.num_mp_steps + 1):
            e_in = jnp.concatenate([e0, e], -1) if g.reattach_initial_edges else e
            h_in = jnp.concatenate([h0, h], -1) if g.reattach_initial_nodes else h

            # Edge update from endpoint states + (reattached) edge state.
            e = edge_mlp(jnp.concatenate([h_in[src], h_in[dst], e_in], -1))

            # Node update by aggregation over incident edges (grouped by src,
            # which covers both endpoints on an undirected duplicated graph).
            if g.time_aware_mp:
                future = src < dst   # forward-in-time edges
                past = src > dst
                fo = flow_out_mlp(jnp.concatenate([h_in[dst], e], -1))
                fo = _aggregate(g.node_agg_fn, fo, src, num_nodes,
                                jnp.logical_and(edge_mask, future))
                fi = flow_in_mlp(jnp.concatenate([h_in[dst], e], -1))
                fi = _aggregate(g.node_agg_fn, fi, src, num_nodes,
                                jnp.logical_and(edge_mask, past))
                h = fuse_mlp(jnp.concatenate([fi, fo], -1))
            else:
                msg = _aggregate(g.node_agg_fn, e, src, num_nodes, edge_mask)
                h = node_mlp(jnp.concatenate([h, msg], -1))

            if step > 1:
                outputs.append(e)
        return outputs


class TrackerModel(nn.Module):
    """Voxel encoder + MPN + edge classifier, end to end.

    Mirrors the three-model bundle built by `Tracking/mpn_trainer.py:50-71`.
    Inputs are a padded sequence graph (see tracking/graph_builder.py):
        voxels:    (N, 32, 32, 32) per-node occupancy grids
        src, dst:  (E,) int32
        edge_attr: (E, edge_in)
        edge_mask: (E,) bool
    Returns (num_classified_steps, E) logits.
    """

    cfg: GraphConfig

    @nn.compact
    def __call__(self, voxels, src, dst, edge_attr, edge_mask):
        node_feats = VoxelEncoder(self.cfg.node_dim, name="voxel_encoder")(voxels)
        edge_states = MPGraph(self.cfg, name="graph_net")(
            node_feats, src, dst, edge_attr, edge_mask)
        clf = EdgeClassifier(self.cfg.classifier_intermed_dim,
                             name="edge_classifier")
        logits = [clf(s)[..., 0] for s in edge_states]
        return jnp.stack(logits, axis=0)


def balanced_bce_loss(logits, targets, mask):
    """Balanced BCE with pos_weight = (#neg / #pos) over valid edges.

    Mirrors `Tracking/mpn_trainer.py:811-830` (compute_losses): mean over
    edges of pos_weight * y * softplus(-x) + (1 - y) * softplus(x).
    """
    mask_f = mask.astype(logits.dtype)
    targets = targets.astype(logits.dtype)
    num_all = jnp.maximum(mask_f.sum(), 1.0)
    num_pos = (targets * mask_f).sum()
    pos_weight = jnp.where(num_pos > 0, (num_all - num_pos) / jnp.maximum(num_pos, 1.0), 1.0)
    per_edge = (pos_weight * targets * jax.nn.softplus(-logits)
                + (1.0 - targets) * jax.nn.softplus(logits))
    return (per_edge * mask_f).sum() / num_all


def tracker_loss(logits_steps, targets, mask):
    """Deep supervision: mean of the balanced BCE over each classified MP step
    (`Tracking/mpn_trainer.py:500-516`)."""
    losses = jax.vmap(lambda lg: balanced_bce_loss(lg, targets, mask))(logits_steps)
    return losses.mean()
