"""Padded sequence-graph construction, on device.

TPU-native replacement for the reference's `GraphDataset.get_edge_data`
(`Tracking/datasets/graph_dataset.py:31-214`) — a triple Python loop over
frames x window x instance pairs with per-pair qhull 3D IoU on CPU.  Here the
edge *structure* is a static template (every (frame t, slot i) x
(frame t+dt, slot j) pair for dt in [1, max_frame_dist]) computed once per
config, and the per-sequence work — edge features, GT identity matching via
BEV 3D IoU, targets — is one batched jit-compiled pass.  Variable instance
counts become validity masks; the whole builder vmaps over a batch of
sequences.

Semantics mirrored from the reference:
  - GT identity: max 3D IoU vs GT boxes, assigned if >= box_iou_thres (0.01)
    (`check_pair`, `Tracking/utils/train_utils.py:67-81`); unmatched
    detections are false positives and excluded from the training graph
    (`graph_dataset.py:96-100,144-145`).
  - Edge features [dPosition(3), dRotation-euler(3), log scale ratio(1),
    dt(1)] with the later frame as "destination" (`graph_dataset.py:166-181`);
    optional |dAppearance| feature (--rel_app) and quaternion rotations
    (--as_quaternion), `Tracking/options.py`.
  - Undirected graphs duplicate edges with *identical* features
    (`graph_dataset.py:204-207`); targets repeat.
  - consecutive_mask marks dt == 1 edges on the forward half
    (`graph_dataset.py:147-162`), used for trajectory assembly and MOTA.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mot3d_tpu.config import TrackingConfig
from mot3d_tpu.geometry.iou3d import box3d_iou_matrix
from mot3d_tpu.geometry.transforms import quaternion_from_euler


class GraphTemplate(NamedTuple):
    """Static edge structure for (seq_len, max_instances, max_frame_dist).

    Arrays are over directed-forward edges E, later duplicated for the
    undirected graph (total 2E).  All entries are host numpy; they become
    constants inside jit.
    """

    src_frame: np.ndarray   # (E,) frame t
    src_slot: np.ndarray    # (E,) instance slot in frame t
    dst_frame: np.ndarray   # (E,) frame t + dt
    dst_slot: np.ndarray    # (E,)
    dt: np.ndarray          # (E,)
    num_nodes: int
    max_instances: int
    seq_len: int


@functools.lru_cache(maxsize=8)
def make_template(seq_len: int, max_instances: int,
                  max_frame_dist: int) -> GraphTemplate:
    src_f, src_s, dst_f, dst_s, dts = [], [], [], [], []
    for t in range(seq_len - 1):
        for dt in range(1, min(max_frame_dist, seq_len - 1 - t) + 1):
            for i in range(max_instances):
                for j in range(max_instances):
                    src_f.append(t)
                    src_s.append(i)
                    dst_f.append(t + dt)
                    dst_s.append(j)
                    dts.append(dt)
    return GraphTemplate(
        np.array(src_f, np.int32), np.array(src_s, np.int32),
        np.array(dst_f, np.int32), np.array(dst_s, np.int32),
        np.array(dts, np.int32), seq_len * max_instances, max_instances,
        seq_len,
    )


class PaddedGraph(NamedTuple):
    """One sequence graph, fully padded/static.  E2 = 2 * E (undirected)."""

    src: jax.Array            # (E2,) int32 node indices (frame * I + slot)
    dst: jax.Array            # (E2,)
    edge_attr: jax.Array      # (E2, edge_dim)
    edge_mask: jax.Array      # (E2,) bool — both endpoints usable
    targets: jax.Array        # (E2,) float {0, 1} same-GT-identity
    consec_mask: jax.Array    # (E2,) bool — dt == 1 AND forward half
    forward_mask: jax.Array   # (E2,) bool — first (directed) copy
    obj_ids: jax.Array        # (T, I) int32 matched GT id, -1 = unmatched/FP
    node_valid: jax.Array     # (T * I,) bool
    false_positives: jax.Array  # () int32 — unmatched valid detections


def match_gt_identity(pred_boxes, det_valid, gt_boxes, gt_ids, gt_valid,
                      iou_thres: float):
    """Per-frame GT identity assignment by max 3D IoU (>= iou_thres).

    pred_boxes (I, 8, 3); gt_boxes (G, 8, 3); gt_ids (G,).
    Returns (I,) int32 of matched GT ids, -1 where unmatched/invalid.
    """
    iou = box3d_iou_matrix(pred_boxes, gt_boxes)          # (I, G)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best = jnp.argmax(iou, axis=1)
    best_iou = jnp.take_along_axis(iou, best[:, None], 1)[:, 0]
    matched = jnp.logical_and(best_iou >= iou_thres, det_valid)
    return jnp.where(matched, gt_ids[best], -1)


def build_graph(template: GraphTemplate, cfg: TrackingConfig,
                det_valid: jax.Array,        # (T, I) bool
                translations: jax.Array,     # (T, I, 3) world
                rotations: jax.Array,        # (T, I, 3) euler
                scales: jax.Array,           # (T, I)
                pred_boxes: jax.Array,       # (T, I, 8, 3)
                gt_boxes: jax.Array,         # (T, G, 8, 3)
                gt_ids: jax.Array,           # (T, G) int32
                gt_valid: jax.Array,         # (T, G) bool
                appearance: Optional[jax.Array] = None,  # (T, I, D)
                with_targets: bool = True) -> PaddedGraph:
    """Construct the padded graph for one sequence (jit/vmap-able).

    With `with_targets=False` (office/no-GT mode,
    `graph_dataset.py:231-343`), all valid-detection pairs become edges and
    targets are zeros.
    """
    T, I = det_valid.shape

    if with_targets:
        obj_ids = jax.vmap(match_gt_identity, in_axes=(0, 0, 0, 0, 0, None))(
            pred_boxes, det_valid, gt_boxes, gt_ids, gt_valid,
            cfg.box_iou_thres)
    else:
        obj_ids = jnp.where(det_valid, 0, -1).astype(jnp.int32)

    false_positives = jnp.logical_and(det_valid, obj_ids < 0).sum().astype(jnp.int32)

    sf, ss = jnp.asarray(template.src_frame), jnp.asarray(template.src_slot)
    df, ds = jnp.asarray(template.dst_frame), jnp.asarray(template.dst_slot)
    dts = jnp.asarray(template.dt)

    def gather(arr):
        return arr[sf, ss], arr[df, ds]

    t_s, t_d = gather(translations)
    r_s, r_d = gather(rotations)
    s_s, s_d = gather(scales)
    v_s, v_d = gather(det_valid)
    id_s, id_d = gather(obj_ids)

    if cfg.as_quaternion:
        rel_rot = quaternion_from_euler(r_d) - quaternion_from_euler(r_s)
    else:
        rel_rot = r_d - r_s
    rel_pos = t_d - t_s
    rel_scale = jnp.log(jnp.maximum(s_d, 1e-12) / jnp.maximum(s_s, 1e-12))
    feats = [rel_pos, rel_rot, rel_scale[:, None], dts[:, None].astype(jnp.float32)]
    if cfg.use_appearance:
        a_s, a_d = gather(appearance)
        feats.append(jnp.linalg.norm(a_d - a_s, axis=-1, keepdims=True))
    edge_attr = jnp.concatenate(feats, axis=-1)

    if with_targets:
        usable_s = jnp.logical_and(v_s, id_s >= 0)
        usable_d = jnp.logical_and(v_d, id_d >= 0)
        edge_mask = jnp.logical_and(usable_s, usable_d)
        targets = jnp.logical_and(edge_mask, id_s == id_d).astype(jnp.float32)
    else:
        edge_mask = jnp.logical_and(v_s, v_d)
        targets = jnp.zeros(edge_attr.shape[0], jnp.float32)

    src = (sf * I + ss).astype(jnp.int32)
    dst = (df * I + ds).astype(jnp.int32)
    consec = jnp.logical_and(edge_mask, dts == 1)

    e = src.shape[0]
    if cfg.undirected:
        src2 = jnp.concatenate([src, dst])
        dst2 = jnp.concatenate([dst, src])
        edge_attr = jnp.concatenate([edge_attr, edge_attr], axis=0)
        edge_mask2 = jnp.concatenate([edge_mask, edge_mask])
        targets = jnp.concatenate([targets, targets])
        consec2 = jnp.concatenate([consec, jnp.zeros_like(consec)])
        fwd = jnp.concatenate([jnp.ones(e, bool), jnp.zeros(e, bool)])
    else:
        src2, dst2, edge_mask2, consec2 = src, dst, edge_mask, consec
        fwd = jnp.ones(e, bool)

    return PaddedGraph(
        src=src2, dst=dst2, edge_attr=edge_attr, edge_mask=edge_mask2,
        targets=targets, consec_mask=consec2, forward_mask=fwd,
        obj_ids=obj_ids, node_valid=det_valid.reshape(-1),
        false_positives=false_positives,
    )
