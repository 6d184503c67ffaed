"""Normalisation layers for the detection model.

Two modes, selected by `DetectionConfig.norm`:

  - "gn" (default): GroupNorm — the from-scratch training choice
    (batch-statistics-free, TPU-friendly; PARITY.md deviation #2 vs the
    reference's FrozenBatchNorm/BatchNorm).
  - "affine": frozen per-channel scale + bias.  This is exactly what the
    reference's normalisation layers compute at inference: detectron2
    FrozenBatchNorm2d in the backbone (`Detection/cfg_setup.py:21` model-zoo
    R50-FPN) and eval-mode BatchNorm2d/3d in the NOCS/voxel heads
    (`Detection/roi_heads/nocs_head.py:171-244`, `voxel_head.py:119-141`)
    reduce to y = x * gamma/sqrt(var+eps) + (beta - mean*gamma/sqrt(var+eps)).
    The torch-checkpoint importer (importers/torch_ckpt.py) folds the BN
    statistics into these two vectors, so imported reference weights
    reproduce the reference forward exactly.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class AffineChannelNorm(nn.Module):
    """Per-channel scale + bias over the trailing axis (folded frozen BN)."""

    dtype: object = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        dt = self.dtype or x.dtype
        return x.astype(dt) * scale.astype(dt) + bias.astype(dt)


def make_norm(norm: str, groups: int, dtype, name: str | None = None):
    """Build the configured norm layer ("gn" -> GroupNorm, "affine" ->
    AffineChannelNorm)."""
    if norm == "affine":
        return AffineChannelNorm(dtype=dtype, name=name)
    if norm == "gn":
        return nn.GroupNorm(groups, dtype=dtype, name=name)
    raise ValueError(f"unknown norm {norm!r} (expected 'gn' or 'affine')")
