"""Box IoU ops: BEV-polygon 3D IoU, 2D IoU, voxel IoU — all branch-free JAX.

TPU-native replacement for the reference's qhull + Sutherland–Hodgman stack
(`Tracking/utils/train_utils.py:83-176`): the intersection of two convex
quads is computed with a fixed-buffer Sutherland–Hodgman clip (max 8 vertices
after clipping a quad by a quad), and its area with the shoelace formula —
the convex hull call is unnecessary because the intersection of convex
polygons is already convex.

Box corner convention: the canonical 8-corner order of
`mot3d_tpu.geometry.transforms.aabb_corners` / `sort_bbox` (reference
`PoseEst/pose_estimation.py:72-93`): corners 0-3 top face (y max), 4-7 bottom
face; BEV rect = corners [3, 2, 1, 0] of (x, z), counter-clockwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# After clipping a 4-gon by 4 half-planes the result has at most 8 vertices;
# buffer 16 leaves headroom and keeps lane-friendly sizes.
_BUF = 16


def _clip_by_edge(pts: jax.Array, count: jax.Array, cp1: jax.Array,
                  cp2: jax.Array):
    """One Sutherland–Hodgman stage: clip polygon (pts, count) by the
    half-plane left of the directed edge cp1 -> cp2 (strict-inside test, as
    the reference `polygon_clip`, `Tracking/utils/train_utils.py:144-145`)."""
    n = pts.shape[0]
    idx = jnp.arange(n)
    in_poly = idx < count
    prev_idx = jnp.where(idx == 0, jnp.maximum(count - 1, 0), idx - 1)
    s = pts[prev_idx]  # previous vertex (circular)
    e = pts

    d = cp2 - cp1

    def inside(p):
        return d[0] * (p[..., 1] - cp1[1]) > d[1] * (p[..., 0] - cp1[0])

    ins_e = jnp.logical_and(inside(e), in_poly)
    ins_s = jnp.logical_and(inside(s), in_poly)

    # Line-line intersection of segment (s, e) with the clip line (cp1, cp2).
    dp = s - e
    n1 = cp1[0] * cp2[1] - cp1[1] * cp2[0]
    n2 = s[..., 0] * e[..., 1] - s[..., 1] * e[..., 0]
    den = (-d[0]) * dp[..., 1] - (-d[1]) * dp[..., 0]
    safe_den = jnp.where(jnp.abs(den) < 1e-12, 1.0, den)
    ix = (n1 * dp[..., 0] - n2 * (-d[0])) / safe_den
    iy = (n1 * dp[..., 1] - n2 * (-d[1])) / safe_den
    ipt = jnp.stack([ix, iy], axis=-1)

    # Each input edge emits up to 2 points, in order [intersection?, e?].
    emit_i = jnp.logical_and(in_poly, ins_e != ins_s)  # crossing edge
    emit_e = ins_e
    # Interleave: for edge j, slots (2j, 2j+1) hold (ipt, e).
    cand = jnp.stack([ipt, e], axis=1).reshape(2 * n, 2)
    flags = jnp.stack([emit_i, emit_e], axis=1).reshape(2 * n)

    # Compact into output buffer.
    pos = jnp.cumsum(flags) - 1
    tgt = jnp.where(flags, jnp.minimum(pos, n - 1), n)
    out = jnp.zeros((n + 1, 2), pts.dtype).at[tgt].set(cand)[:n]
    new_count = jnp.minimum(flags.sum(), n)
    return out, new_count


def polygon_clip_area(subject: jax.Array, clip: jax.Array):
    """Area of the intersection of two convex CCW polygons.

    subject: (4, 2), clip: (4, 2).  Returns (area, count) where count == 0
    reproduces the reference's None case (empty intersection -> area 0).
    """
    pts = jnp.zeros((_BUF, 2), subject.dtype).at[:4].set(subject)
    count = jnp.asarray(4, jnp.int32)
    for k in range(4):
        cp1 = clip[(k - 1) % 4]
        cp2 = clip[k]
        pts, count = _clip_by_edge(pts, count, cp1, cp2)
    area = _shoelace(pts, count)
    return area, count


def _shoelace(pts: jax.Array, count: jax.Array) -> jax.Array:
    n = pts.shape[0]
    idx = jnp.arange(n)
    m = idx < count
    nxt = jnp.where(idx + 1 >= count, 0, idx + 1)
    x, y = pts[:, 0], pts[:, 1]
    terms = x * y[nxt] - x[nxt] * y
    return 0.5 * jnp.abs(jnp.where(m, terms, 0.0).sum())


def _bev_rect(corners: jax.Array) -> jax.Array:
    """Top-face corners [3,2,1,0] as CCW (x, z) rect — reference
    `compute_3d_iou` (`Tracking/utils/train_utils.py:86-87`)."""
    return corners[jnp.array([3, 2, 1, 0])][:, jnp.array([0, 2])]


def box3d_iou(corners1: jax.Array, corners2: jax.Array):
    """(3D IoU, BEV 2D IoU) of two canonical 8x3 corner boxes.

    Mirrors `compute_3d_iou` (`Tracking/utils/train_utils.py:83-103`):
    BEV polygon intersection area x clamped y-overlap; volumes from edge
    lengths (corners 0-1, 1-2, 0-4).
    """
    r1, r2 = _bev_rect(corners1), _bev_rect(corners2)
    a1 = _shoelace(jnp.pad(r1, ((0, _BUF - 4), (0, 0))), jnp.asarray(4))
    a2 = _shoelace(jnp.pad(r2, ((0, _BUF - 4), (0, 0))), jnp.asarray(4))
    inter_area, _ = polygon_clip_area(r1, r2)
    iou2d = inter_area / jnp.maximum(a1 + a2 - inter_area, 1e-12)

    ymax = jnp.minimum(corners1[0, 1], corners2[0, 1])
    ymin = jnp.maximum(corners1[4, 1], corners2[4, 1])
    inter_vol = inter_area * jnp.maximum(0.0, ymax - ymin)

    v1 = _box_vol(corners1)
    v2 = _box_vol(corners2)
    iou = inter_vol / jnp.maximum(v1 + v2 - inter_vol, 1e-12)
    return iou, iou2d


def _box_vol(c: jax.Array) -> jax.Array:
    a = jnp.linalg.norm(c[0] - c[1])
    b = jnp.linalg.norm(c[1] - c[2])
    h = jnp.linalg.norm(c[0] - c[4])
    return a * b * h


def box3d_iou_matrix(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Pairwise 3D IoU: (M, 8, 3) x (N, 8, 3) -> (M, N).  vmap over both."""
    f = jax.vmap(lambda b1: jax.vmap(lambda b2: box3d_iou(b1, b2)[0])(boxes2))
    return f(boxes1)


def box2d_iou(b1: jax.Array, b2: jax.Array) -> jax.Array:
    """IoU of XYXY 2D boxes (...,4). Matches detectron2 pairwise_iou math."""
    x1 = jnp.maximum(b1[..., 0], b2[..., 0])
    y1 = jnp.maximum(b1[..., 1], b2[..., 1])
    x2 = jnp.minimum(b1[..., 2], b2[..., 2])
    y2 = jnp.minimum(b1[..., 3], b2[..., 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    a1 = jnp.clip(b1[..., 2] - b1[..., 0], 0) * jnp.clip(b1[..., 3] - b1[..., 1], 0)
    a2 = jnp.clip(b2[..., 2] - b2[..., 0], 0) * jnp.clip(b2[..., 3] - b2[..., 1], 0)
    return inter / jnp.maximum(a1 + a2 - inter, 1e-12)


def box2d_iou_matrix(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """(M, 4) x (N, 4) -> (M, N) 2D IoU matrix."""
    return box2d_iou(boxes1[:, None, :], boxes2[None, :, :])


def voxel_iou(pred: jax.Array, gt: jax.Array, thresh: float = 0.5) -> jax.Array:
    """Occupancy IoU at a probability threshold.

    Mirrors `compute_voxel_iou` (`Detection/inference/inference_metrics.py:11-21`).
    pred: probabilities or logits>0.5-binarisable grid; gt: {0,1} grid.
    """
    p = pred >= thresh
    g = gt >= 0.5
    inter = jnp.logical_and(p, g).sum()
    union = jnp.logical_or(p, g).sum()
    return inter / jnp.maximum(union, 1)
