"""NOCS (normalized object coordinate) ROI head: decoder + symmetry loss.

Re-design of `Detection/roi_heads/nocs_head.py`:
  - NocsModel (:159-263): regression decoder (transposed-conv stack 256->
    256->128->64->3, sigmoid, 14->28) and the bin-classification variant
    (three per-channel towers -> (28, 28, 3, num_bins) logits).
  - nocs_loss (:20-129): the reference pastes the predicted 28x28 patch into
    a 240x320 canvas via roi_align and computes a symmetry-aware smooth-L1 on
    the pixel region where the predicted and GT boxes overlap.  Here the
    overlap region is *sampled on a fixed SxS grid* and both patches are
    bilinearly interpolated at those points — the same mean over the overlap
    up to resampling, with fully static shapes (no per-instance canvases).
    Symmetry: loss = min over Y-axis rotations of the GT coordinates
    (180 deg for 'table'; identity otherwise), background (white) pixels
    exempted — `Detection/utils/train_utils.py:33-93`.
  - nocs_inference (:131-156): bin variant converts per-channel bin argmax
    back to values in [0, 1] (`train_utils.py:176-197`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mot3d_tpu.models.norms import AffineChannelNorm, make_norm


class NocsDecoder(nn.Module):
    """(N, 14, 14, 256) -> (N, 28, 28, 3) in [0, 1] (regression mode).

    norm="affine" is the torch-import parity mode: the reference's blocks
    are ConvTranspose -> ReLU -> BatchNorm (`nocs_head.py:220-244`), so the
    folded BN affine is applied AFTER the activation there (GroupNorm sits
    between conv and ReLU in the from-scratch "gn" mode)."""

    dtype: object = None    # computation dtype (params stay f32)
    norm: str = "gn"

    @nn.compact
    def __call__(self, x):
        def block(x, ch, k, strides=(1, 1)):
            x = nn.ConvTranspose(ch, k, strides=strides, padding="SAME",
                                 dtype=self.dtype)(x)
            if self.norm == "affine":
                return AffineChannelNorm(dtype=self.dtype)(jax.nn.relu(x))
            return jax.nn.relu(nn.GroupNorm(32, dtype=self.dtype)(x))

        x = block(x, 256, (3, 3))
        x = block(x, 128, (3, 3))
        x = block(x, 64, (4, 4), strides=(2, 2))
        x = nn.ConvTranspose(3, (3, 3), padding="SAME", dtype=self.dtype)(x)
        return jax.nn.sigmoid(x.astype(jnp.float32))


class NocsBinDecoder(nn.Module):
    """Bin-classification variant: (N, 14, 14, 256) -> (N, 28, 28, 3, bins)
    logits, one transposed-conv tower per coordinate channel."""

    num_bins: int = 32
    dtype: object = None    # computation dtype (params stay f32)
    norm: str = "gn"

    @nn.compact
    def __call__(self, x):
        def nact(t):
            # Reference tower blocks are ConvT -> ReLU -> BN
            # (`nocs_head.py:171-215`); see NocsDecoder.
            if self.norm == "affine":
                return AffineChannelNorm(dtype=self.dtype)(jax.nn.relu(t))
            return jax.nn.relu(nn.GroupNorm(32, dtype=self.dtype)(t))

        outs = []
        for ch in ("r", "g", "b"):
            t = nn.ConvTranspose(128, (3, 3), padding="SAME",
                                 name=f"l1_{ch}", dtype=self.dtype)(x)
            t = nact(t)
            t = nn.ConvTranspose(64, (4, 4), strides=(2, 2), padding="SAME",
                                 name=f"l2_{ch}", dtype=self.dtype)(t)
            t = nact(t)
            t = nn.ConvTranspose(self.num_bins, (3, 3), padding="SAME",
                                 name=f"l3_{ch}", dtype=self.dtype)(t)
            outs.append(t.astype(jnp.float32))
        return jnp.stack(outs, axis=-2)  # (N, 28, 28, 3, bins)


def nocs_bins_to_values(logits: jax.Array, num_bins: int = 32) -> jax.Array:
    """(..., 3, bins) logits -> (..., 3) values: argmax bin / (bins - 1)
    (`Detection/utils/train_utils.py:176-197`)."""
    idx = jnp.argmax(logits, axis=-1)
    return idx.astype(jnp.float32) / (num_bins - 1)


# ------------------------------------------------------------------ loss


# NumPy (not jnp) so importing this module never initialises a JAX backend.
_Y_ROTATIONS = np.stack([
    np.eye(3, dtype=np.float32),
    # 180 degrees about Y (train_utils.py:57-60).
    np.array([[-1.0, 0, 0], [0, 1.0, 0], [0, 0, -1.0]], np.float32),
])


def _bilinear_patch_sample(patch: jax.Array, u: jax.Array, v: jax.Array,
                           box: jax.Array) -> jax.Array:
    """Sample patch (P, P, C) at image coords (u, v) given its image box
    (XYXY), aligned=True convention; clamped at patch edges."""
    p = patch.shape[0]
    x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
    fx = (u - x0) / jnp.maximum(x1 - x0, 1e-6) * p - 0.5
    fy = (v - y0) / jnp.maximum(y1 - y0, 1e-6) * p - 0.5
    fx = jnp.clip(fx, 0.0, p - 1.0)
    fy = jnp.clip(fy, 0.0, p - 1.0)
    ix0 = jnp.floor(fx).astype(jnp.int32)
    iy0 = jnp.floor(fy).astype(jnp.int32)
    ix1 = jnp.minimum(ix0 + 1, p - 1)
    iy1 = jnp.minimum(iy0 + 1, p - 1)
    wx1 = fx - ix0
    wy1 = fy - iy0
    v00 = patch[iy0, ix0]
    v01 = patch[iy0, ix1]
    v10 = patch[iy1, ix0]
    v11 = patch[iy1, ix1]
    return (v00 * ((1 - wy1) * (1 - wx1))[..., None]
            + v01 * ((1 - wy1) * wx1)[..., None]
            + v10 * (wy1 * (1 - wx1))[..., None]
            + v11 * (wy1 * wx1)[..., None])


def _smooth_l1(x, beta=0.1):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def _rotate_nocs(values: jax.Array, rot: jax.Array) -> jax.Array:
    """Rotate NOCS coordinates about the grid centre; background (white)
    pixels exempt (centered sum == 1.5, `train_utils.py:74-77`)."""
    centred = values - 0.5
    rotated = centred @ rot.T + 0.5
    is_bg = jnp.abs(centred.sum(-1) - 1.5) < 0.05
    return jnp.where(is_bg[..., None], values, rotated)


def nocs_sample_loss(pred_patch: jax.Array, gt_patch: jax.Array,
                     pred_box: jax.Array, gt_box: jax.Array,
                     is_symmetric: jax.Array, grid: int = 28):
    """Per-instance symmetry smooth-L1 on the pred/GT box overlap region.

    pred_patch: (28, 28, 3); gt_patch: (P, P, 3) (normalised crop of the GT
    box); boxes XYXY in image coords.  Returns (loss, valid).
    """
    x0 = jnp.maximum(pred_box[0], gt_box[0])
    y0 = jnp.maximum(pred_box[1], gt_box[1])
    x1 = jnp.minimum(pred_box[2], gt_box[2])
    y1 = jnp.minimum(pred_box[3], gt_box[3])
    valid = jnp.logical_and(x1 > x0 + 1.0, y1 > y0 + 1.0)

    us = x0 + (jnp.arange(grid) + 0.5) / grid * (x1 - x0)
    vs = y0 + (jnp.arange(grid) + 0.5) / grid * (y1 - y0)
    uu, vv = jnp.meshgrid(us, vs)

    pred_vals = _bilinear_patch_sample(pred_patch, uu, vv, pred_box)
    gt_vals = _bilinear_patch_sample(gt_patch, uu, vv, gt_box)

    loss_id = _smooth_l1(pred_vals - gt_vals).mean()
    gt_rot = _rotate_nocs(gt_vals, _Y_ROTATIONS[1])
    loss_rot = _smooth_l1(pred_vals - gt_rot).mean()
    loss = jnp.where(is_symmetric, jnp.minimum(loss_id, loss_rot), loss_id)
    return jnp.where(valid, loss, 0.0), valid


def nocs_loss(pred_patches: jax.Array, gt_patches: jax.Array,
              pred_boxes: jax.Array, gt_boxes: jax.Array,
              gt_classes: jax.Array, weights: jax.Array,
              symmetric_class_ids: jax.Array,
              loss_weight: float = 3.0) -> jax.Array:
    """Batched masked NOCS loss.

    pred_patches (N, 28, 28, 3); gt_patches (N, P, P, 3) matched GT crops;
    weights (N,) select instances (fg proposal & max-IoU >= 0.5,
    `nocs_head.py:56-62`).  Sum of per-instance losses / #contributing
    instances * loss_weight (`nocs_head.py:123-127`).
    """
    is_sym = jnp.isin(gt_classes, symmetric_class_ids)
    losses, valids = jax.vmap(nocs_sample_loss)(
        pred_patches, gt_patches, pred_boxes, gt_boxes, is_sym)
    w = weights * valids.astype(weights.dtype)
    denom = jnp.maximum(w.sum(), 1.0)
    return (losses * w).sum() / denom * loss_weight


def nocs_bin_loss(pred_logits: jax.Array, gt_patches: jax.Array,
                  pred_boxes: jax.Array, gt_boxes: jax.Array,
                  gt_classes: jax.Array, weights: jax.Array,
                  symmetric_class_ids: jax.Array, num_bins: int = 32,
                  loss_weight: float = 0.2, grid: int = 28) -> jax.Array:
    """Bin-classification variant (`train_utils.py:96-172`): per-channel
    cross-entropy against the discretised GT coordinate, symmetry-aware."""
    is_sym = jnp.isin(gt_classes, symmetric_class_ids)

    def per_instance(logits, gt_patch, pbox, gbox, sym):
        x0 = jnp.maximum(pbox[0], gbox[0])
        y0 = jnp.maximum(pbox[1], gbox[1])
        x1 = jnp.minimum(pbox[2], gbox[2])
        y1 = jnp.minimum(pbox[3], gbox[3])
        valid = jnp.logical_and(x1 > x0 + 1.0, y1 > y0 + 1.0)
        us = x0 + (jnp.arange(grid) + 0.5) / grid * (x1 - x0)
        vs = y0 + (jnp.arange(grid) + 0.5) / grid * (y1 - y0)
        uu, vv = jnp.meshgrid(us, vs)
        # logits (28, 28, 3, bins) -> flatten channel+bin for sampling.
        lg = logits.reshape(logits.shape[0], logits.shape[1], -1)
        lg_s = _bilinear_patch_sample(lg, uu, vv, pbox).reshape(
            grid, grid, 3, num_bins)
        gt_vals = _bilinear_patch_sample(gt_patch, uu, vv, gbox)

        def ce(gt_v):
            tgt = jnp.clip(jnp.floor(gt_v * num_bins - 1e-6), 0,
                           num_bins - 1).astype(jnp.int32)
            logp = jax.nn.log_softmax(lg_s, axis=-1)
            return -jnp.take_along_axis(logp, tgt[..., None], -1).mean()

        l_id = ce(gt_vals)
        l_rot = ce(_rotate_nocs(gt_vals, _Y_ROTATIONS[1]))
        loss = jnp.where(sym, jnp.minimum(l_id, l_rot), l_id)
        return jnp.where(valid, loss, 0.0), valid

    losses, valids = jax.vmap(per_instance)(
        pred_logits, gt_patches, pred_boxes, gt_boxes, is_sym)
    w = weights * valids.astype(weights.dtype)
    return (losses * w).sum() / jnp.maximum(w.sum(), 1.0) * loss_weight
