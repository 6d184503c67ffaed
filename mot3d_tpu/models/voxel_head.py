"""Voxel reconstruction ROI head (Pix2Vox++-style 3D deconv decoder).

Re-design of `Detection/roi_heads/voxel_head.py`:
  - Decoder (:109-163): pooled ROI features (14x14x256 = 784 x 4^3) reshaped
    into a (4, 4, 4, 784) volume, then 5 transposed-conv-3D blocks up to
    (32, 32, 32, 1) logits.  NDHWC layout; GroupNorm instead of BatchNorm3d
    (batch-statistics-free, TPU-friendly; documented deviation).
  - voxel_loss (:26-82): the reference's per-instance Python loop (max-IoU GT
    match >= 0.5, balanced BCE over the selected instances) becomes one
    masked batched op: per-instance weights select contributing instances and
    the balanced pos_weight is computed over exactly those voxels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mot3d_tpu.geometry.iou3d import voxel_iou
from mot3d_tpu.models.norms import make_norm


class Pix2VoxDecoder(nn.Module):
    """(N, 14, 14, C) pooled features -> (N, 32, 32, 32) occupancy logits.

    norm="affine" + torch_reshape=True is the torch-import parity mode: BN
    statistics fold into per-channel affines and the feature->volume reshape
    follows torch's channel-major view() semantics
    (`Detection/roi_heads/voxel_head.py:147-148`: (N, 256, 14, 14) ->
    (N, 784, 4, 4, 4)), so imported reference weights reproduce the
    reference decoder exactly (importers/torch_ckpt.py).
    """

    width_mult: float = 1.0
    dtype: object = None    # computation dtype (params stay f32)
    norm: str = "gn"
    torch_reshape: bool = False

    @nn.compact
    def __call__(self, x):
        n = x.shape[0]
        if self.torch_reshape:
            # torch view() groups the CHW-major flat index into (784, 4^3).
            vol = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, -1, 4, 4, 4)
            vol = jnp.transpose(vol, (0, 2, 3, 4, 1))
        else:
            vol = x.reshape(n, 4, 4, 4, -1)  # 784 at 256ch/14x14

        def w(c):
            return max(8, int(c * self.width_mult))

        def gn(t):
            return make_norm(self.norm, min(8, t.shape[-1]),
                             self.dtype)(t)

        def ct(ch, k, **kw):
            # The reference decoder's transposed convs are bias-free (BN
            # follows each); keep a bias in gn mode (it replaces BN's beta).
            return nn.ConvTranspose(ch, k, padding="SAME", dtype=self.dtype,
                                    **kw)

        vol = ct(w(512), (3, 3, 3))(vol)
        vol = jax.nn.relu(gn(vol))
        vol = ct(w(128), (4, 4, 4), strides=(2, 2, 2))(vol)
        vol = jax.nn.relu(gn(vol))
        vol = ct(w(32), (4, 4, 4), strides=(2, 2, 2))(vol)
        vol = jax.nn.relu(gn(vol))
        vol = ct(w(8), (4, 4, 4), strides=(2, 2, 2))(vol)
        vol = jax.nn.relu(gn(vol))
        vol = ct(1, (1, 1, 1))(vol)
        return vol[..., 0].astype(jnp.float32)  # logits feed losses: f32


def voxel_loss(pred_logits: jax.Array, gt_voxels: jax.Array,
               weights: jax.Array, loss_weight: float = 0.75):
    """Balanced BCE over selected instances.

    pred_logits, gt_voxels: (N, 32, 32, 32); weights: (N,) in {0, 1}.
    pos_weight = (#empty / #occupied) over the selected GT voxels
    (`Detection/utils/train_utils.py:18-31`).  Returns (loss, mean_voxel_iou)
    — the IoU mirrors the reference's training/voxel_iou scalar
    (`voxel_head.py:64-72`).
    """
    w = weights.astype(pred_logits.dtype)[:, None, None, None]
    gt = gt_voxels.astype(pred_logits.dtype)
    occupied = (gt * w).sum()
    total = w.sum() * gt[0].size
    pos_weight = jnp.where(occupied > 0,
                           (total - occupied) / jnp.maximum(occupied, 1.0), 1.0)
    per_vox = (pos_weight * gt * jax.nn.softplus(-pred_logits)
               + (1.0 - gt) * jax.nn.softplus(pred_logits))
    loss = (per_vox * w).sum() / jnp.maximum(total, 1.0)

    probs = jax.nn.sigmoid(pred_logits)
    ious = jax.vmap(voxel_iou)(probs, gt)
    mean_iou = (ious * weights).sum() / jnp.maximum(weights.sum(), 1.0)
    return loss * loss_weight, mean_iou
