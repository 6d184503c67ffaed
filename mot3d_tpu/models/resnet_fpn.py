"""ResNet-50 + FPN backbone in flax (NHWC, TPU-native).

Replaces detectron2's GeneralizedRCNN backbone configured by
`Detection/cfg_setup.py:21` (mask_rcnn_R_50_FPN_3x).  Plain convolutions XLA
fuses onto the MXU; normalisation is GroupNorm (detectron2 uses FrozenBN
tied to ImageNet pretraining — training from scratch on TPU, GroupNorm is
the stable, batch-independent choice; documented deviation).

Outputs P2..P6 (strides 4..64), 256 channels each, finest first.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mot3d_tpu.models.norms import make_norm


class Bottleneck(nn.Module):
    channels: int           # bottleneck width; output = 4x
    stride: int = 1
    dtype: object = None    # computation dtype (params stay f32)
    norm: str = "gn"        # "gn" or "affine" (imported FrozenBN)
    # detectron2's caffe-style R50 zoo weights put the stage stride on the
    # 1x1 conv (RESNETS.STRIDE_IN_1X1=True, the mask_rcnn_R_50_FPN_3x
    # default the reference trains from, `Detection/cfg_setup.py:21`);
    # torchvision-style (our from-scratch default) strides the 3x3.  Same
    # weights compute DIFFERENT functions under the two placements, so
    # imported checkpoints must set this True (importers/torch_ckpt.
    # import_config) — pinned by the torch-mimic parity test.
    stride_in_1x1: bool = False

    @nn.compact
    def __call__(self, x):
        out_ch = self.channels * 4
        s1 = self.stride if self.stride_in_1x1 else 1
        s3 = 1 if self.stride_in_1x1 else self.stride
        shortcut = x
        if self.stride != 1 or x.shape[-1] != out_ch:
            shortcut = nn.Conv(out_ch, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="proj")(x)
            shortcut = make_norm(self.norm, 32, self.dtype,
                                 name="proj_gn")(shortcut)
        y = nn.Conv(self.channels, (1, 1), strides=s1, use_bias=False,
                    dtype=self.dtype)(x)
        y = jax.nn.relu(make_norm(self.norm, 32, self.dtype)(y))
        y = nn.Conv(self.channels, (3, 3), strides=s3,
                    padding=1, use_bias=False, dtype=self.dtype)(y)
        y = jax.nn.relu(make_norm(self.norm, 32, self.dtype)(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = make_norm(self.norm, 32, self.dtype)(y)
        return jax.nn.relu(y + shortcut)


class ResNet(nn.Module):
    depth: int = 50
    width_mult: float = 1.0   # channel multiplier (tiny test configs)
    dtype: object = None
    norm: str = "gn"
    stride_in_1x1: bool = False

    @nn.compact
    def __call__(self, x):
        blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[self.depth]
        def w(c):
            return max(32, int(c * self.width_mult))
        x = nn.Conv(w(64), (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="stem")(x)
        x = jax.nn.relu(make_norm(self.norm, 32, self.dtype,
                                  name="stem_gn")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        for stage, (n_blocks, ch) in enumerate(zip(blocks, (64, 128, 256, 512))):
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                x = Bottleneck(w(ch), stride, dtype=self.dtype,
                               norm=self.norm,
                               stride_in_1x1=self.stride_in_1x1,
                               name=f"res{stage + 2}_{b}")(x)
            feats.append(x)
        return feats  # C2 (stride 4) .. C5 (stride 32)


class FPN(nn.Module):
    out_channels: int = 256
    dtype: object = None

    @nn.compact
    def __call__(self, c_feats: Sequence[jax.Array]):
        laterals = [nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                            name=f"lat{i + 2}")(c)
                    for i, c in enumerate(c_feats)]
        # Top-down pathway.
        outs = [laterals[-1]]
        for lat in laterals[-2::-1]:
            up = jax.image.resize(outs[0], lat.shape, "nearest")
            outs.insert(0, lat + up)
        ps = [nn.Conv(self.out_channels, (3, 3), padding=1,
                      dtype=self.dtype,
                      name=f"post{i + 2}")(o) for i, o in enumerate(outs)]
        # P6 for RPN: stride-2 maxpool of P5.
        p6 = nn.max_pool(ps[-1], (1, 1), strides=(2, 2))
        return ps + [p6]  # P2..P6


class ResNetFPN(nn.Module):
    depth: int = 50
    out_channels: int = 256
    width_mult: float = 1.0
    dtype: object = None
    norm: str = "gn"
    stride_in_1x1: bool = False

    @nn.compact
    def __call__(self, images):
        """images: (B, H, W, 3) normalised.  Returns [P2..P6] (B, h, w, 256),
        cast back to float32 so downstream heads/pooling stay f32-exact."""
        if self.dtype is not None:
            images = images.astype(self.dtype)
        c_feats = ResNet(self.depth, self.width_mult, self.dtype,
                         self.norm, self.stride_in_1x1, name="resnet")(images)
        ps = FPN(self.out_channels, self.dtype, name="fpn")(c_feats)
        return [p.astype(jnp.float32) for p in ps]
