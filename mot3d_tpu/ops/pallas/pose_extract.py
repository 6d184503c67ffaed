"""Pallas kernel: fused pose point-extraction for all detections of a frame.

One program per detection fuses what the XLA path (pose/extraction.py
grid_extract) expresses as separate ops — sample-position computation,
nearest-pixel depth lookup (as two small MXU matmuls against one-hot
selector matrices), bilinear NOCS/mask patch resampling, validity gating
and backprojection — with the depth map held in VMEM ONCE for the whole
frame instead of being re-read from HBM per detection.  Everything lives in
VMEM: depth (240x320 f32 = 300 KB), the per-detection 28x28 patches, and
the (6, 32, 32) output block.

Semantics are identical to `grid_extract` (tests/test_pose_extract_pallas
asserts bit-level agreement); `cfg.pose.extraction = "pallas"` selects this
kernel, "grid" the XLA formulation, "full" the round-1 paste+gather path.

Reference behaviour being fused: `PoseEst/pose_estimation.py:245-310`
(zero-pad depth to box, per-pixel NOCS paste, mask gather) +
`Detection/tracker/postprocess.py:140-151` (roi_align NOCS resize).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(boxes_ref, intr_ref, depth_ref, nocs_ref, mask_ref,
            feats_ref, valid_ref, *, grid: int, patch: int,
            mask_thresh: float):
    h, w = depth_ref.shape
    g, p = grid, patch
    x0 = boxes_ref[0, 0, 0]
    y0 = boxes_ref[0, 0, 1]
    x1 = boxes_ref[0, 0, 2]
    y1 = boxes_ref[0, 0, 3]
    fx = intr_ref[0, 0, 0]
    fy = intr_ref[0, 0, 1]
    cx = intr_ref[0, 0, 2]
    cy = intr_ref[0, 0, 3]

    def sample_ix(lo, hi, n, size):
        """Covering-pixel indices (g, 1) + one-hot (g, size) + in-range.
        (int32 iota: Mosaic's tpu.iota only produces integers.)"""
        s = jax.lax.broadcasted_iota(jnp.int32, (n, size), 0) \
            .astype(jnp.float32)
        pix = jax.lax.broadcasted_iota(jnp.int32, (n, size), 1) \
            .astype(jnp.float32)
        pos = lo + (s + 0.5) / n * (hi - lo)
        idxf = jnp.floor(pos)                     # (n, size) constant cols
        onehot = (pix == jnp.clip(idxf, 0, size - 1)).astype(jnp.float32)
        ok = (idxf[:, :1] >= 0) & (idxf[:, :1] < size)
        return idxf[:, :1], onehot, ok

    vyf, row_oh, ok_v = sample_ix(y0, y1, g, h)   # (g,1), (g,h), (g,1)
    uxf, col_oh, ok_u = sample_ix(x0, x1, g, w)

    # Depth at sampled pixels: (g, h) @ (h, w) @ (w, g) on the MXU.
    d_rows = jnp.dot(row_oh, depth_ref[:, :],
                     preferred_element_type=jnp.float32)        # (g, w)
    d = jnp.dot(d_rows, col_oh.T,
                preferred_element_type=jnp.float32)             # (g, g)

    def patch_w(lo, hi, idxf):
        """Bilinear (g, p) weights at pixel centres (aligned paste)."""
        f = (idxf + 0.5 - lo) / jnp.maximum(hi - lo, 1e-6) * p - 0.5
        f = jnp.clip(f, 0.0, p - 1.0)                           # (g, 1)
        j = jax.lax.broadcasted_iota(jnp.int32, (g, p), 1) \
            .astype(jnp.float32)
        wgt = jnp.maximum(0.0, 1.0 - jnp.abs(f - j))
        return wgt / jnp.maximum(wgt.sum(-1, keepdims=True), 1e-6)

    wy = patch_w(y0, y1, vyf)                                   # (g, p)
    wx = patch_w(x0, x1, uxf)

    m_s = jnp.dot(jnp.dot(wy, mask_ref[0], preferred_element_type=jnp.float32),
                  wx.T, preferred_element_type=jnp.float32)     # (g, g)

    valid = ((d > 0) & (m_s >= mask_thresh)
             & ok_v & ok_u.reshape(1, g))                       # (g, g)
    vf = valid.astype(jnp.float32)

    # Backprojection at integer pixel coords (y, z negated).
    uu = uxf.reshape(1, g)
    vv = vyf
    feats_ref[0, 0] = (uu - cx) / fx * d * vf
    feats_ref[0, 1] = -((vv - cy) / fy * d) * vf
    feats_ref[0, 2] = -d * vf
    for c in range(3):
        n_s = jnp.dot(
            jnp.dot(wy, nocs_ref[0, c], preferred_element_type=jnp.float32),
            wx.T, preferred_element_type=jnp.float32)
        feats_ref[0, 3 + c] = n_s * vf
    valid_ref[0] = vf


@functools.partial(jax.jit, static_argnames=("grid", "mask_thresh",
                                             "interpret"))
def pose_extract_pallas(nocs_patches: jax.Array, masks28: jax.Array,
                        boxes: jax.Array, depth: jax.Array,
                        intrinsics: jax.Array, grid: int = 32,
                        mask_thresh: float = 0.5,
                        interpret: bool = False):
    """All detections of one frame -> ((D, grid*grid, 6), (D, grid*grid)).

    nocs_patches (D, P, P, 3); masks28 (D, P, P); boxes (D, 4) XYXY;
    depth (H, W); intrinsics (3, 3).  Same contract as
    vmap(grid_extract) over detections.
    """
    d_count, p = nocs_patches.shape[0], nocs_patches.shape[1]
    h, w = depth.shape
    nocs_t = jnp.transpose(nocs_patches, (0, 3, 1, 2)).astype(jnp.float32)
    # Scalar inputs are tiled to an (8, 4) trailing block: Mosaic requires
    # the last two block dims be (8k, 128k) or equal to the array dims, and
    # "equal dims" stays legal when jax.vmap batches this pallas_call
    # (a (1, 4) block would not be).
    boxes_t = jnp.broadcast_to(boxes.astype(jnp.float32)[:, None, :],
                               (d_count, 8, 4))
    intr = jnp.broadcast_to(
        jnp.stack([intrinsics[0, 0], intrinsics[1, 1],
                   intrinsics[0, 2], intrinsics[1, 2]]).reshape(1, 1, 4),
        (1, 8, 4))

    kern = functools.partial(_kernel, grid=grid, patch=p,
                             mask_thresh=mask_thresh)
    feats, valid = pl.pallas_call(
        kern,
        grid=(d_count,),
        in_specs=[
            pl.BlockSpec((1, 8, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),          # boxes
            pl.BlockSpec((1, 8, 4), lambda i: (0, 0, 0),
                         memory_space=pltpu.SMEM),          # intrinsics
            pl.BlockSpec((h, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # depth (shared)
            pl.BlockSpec((1, 3, p, p), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),          # nocs
            pl.BlockSpec((1, p, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # mask
        ],
        out_specs=[
            pl.BlockSpec((1, 6, grid, grid), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, grid, grid), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d_count, 6, grid, grid), jnp.float32),
            jax.ShapeDtypeStruct((d_count, grid, grid), jnp.float32),
        ],
        interpret=interpret,
    )(boxes_t, intr, depth.astype(jnp.float32),
      nocs_t, masks28.astype(jnp.float32))

    feats = jnp.transpose(feats, (0, 2, 3, 1)).reshape(
        d_count, grid * grid, 6)
    return feats, valid.reshape(d_count, grid * grid) > 0.5
