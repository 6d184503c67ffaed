"""Torch checkpoint importer: reference .pth state_dicts -> flax params.

The reference's whole protocol starts from pretrained torch weights: the
detector initialises from the COCO model zoo and trains to a
`best_model.pth` consumed by every inference entry point
(`Detection/cfg_setup.py:21,137`, `README.md:24,55,64`), and the tracking
stack loads per-module `.pth` files ({voxel_encoder, graph_net,
edge_classifier}.pth, `Tracking/mpn_trainer.py:933-960`).  This module lets
the rebuild ingest those checkpoints:

  - `import_detectron2_maskrcnn`: detectron2-format GeneralizedRCNN
    state_dict (backbone.bottom_up/FPN/RPN/ROI heads + the reference's
    voxel/NOCS heads) -> params for `MaskRCNN` built with
    cfg.norm="affine", cfg.voxel_torch_reshape=True.  FrozenBatchNorm /
    eval-mode BatchNorm statistics are folded into per-channel affine
    layers (models/norms.py).  Missing heads (e.g. a COCO zoo checkpoint
    without voxel/NOCS weights) keep their fresh initialisation when
    `init_params` is provided.
  - `import_tracking_modules`: the three tracking nets -> params for
    `TrackerModel` (models/mpn.py).

Layout conversions (verified numerically in tests/test_torch_import.py):
  - Conv2d/3d weight (O, I, k...) -> flax (k..., I, O); no spatial flip
    (both frameworks correlate).
  - ConvTranspose2d/3d weight (I, O, k...) -> flax (k..., I, O) with
    spatial axes FLIPPED (torch computes the conv gradient; flax
    ConvTranspose correlates the dilated input).  Padding: torch's p=k-s
    trim equals flax "SAME" for every kernel the reference uses
    (k3s1p1, k4s2p1, k2s2p0, k1s1p0).
  - Linear (O, I) -> (I, O); Linear-after-flatten additionally permutes
    the input axis from torch's channel-major (C, ...) flatten to our
    channels-last flatten.
  - BatchNorm/FrozenBN (gamma, beta, mean, var) -> affine
    scale = gamma/sqrt(var+eps), bias = beta - mean*scale.

Anchor grid: our from-scratch default centres anchors at (i + 0.5) *
stride; detectron2's DefaultAnchorGenerator uses offset 0.0, so imported
configs set cfg.anchor_offset=0.0 (`import_config` below / the
import-torch-ckpt CLI) and imported RPN deltas decode against exactly the
anchors they were trained with.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from mot3d_tpu.config import DetectionConfig, GraphConfig

_BN_EPS = 1e-5


# ----------------------------------------------------------- primitives


def _np(t) -> np.ndarray:
    """torch.Tensor | np.ndarray -> float32 numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def conv_kernel(w) -> np.ndarray:
    """torch Conv{2,3}d weight (O, I, k...) -> flax (k..., I, O)."""
    w = _np(w)
    nd = w.ndim
    return np.transpose(w, tuple(range(2, nd)) + (1, 0))


def conv_transpose_kernel(w) -> np.ndarray:
    """torch ConvTranspose{2,3}d weight (I, O, k...) -> flax (k..., I, O),
    spatial axes flipped (see module docstring)."""
    w = _np(w)
    nd = w.ndim
    w = np.transpose(w, tuple(range(2, nd)) + (0, 1))
    return np.ascontiguousarray(w[(slice(None, None, -1),) * (nd - 2)])


def linear_kernel(w) -> np.ndarray:
    """torch Linear weight (O, I) -> flax Dense kernel (I, O)."""
    return np.ascontiguousarray(_np(w).T)


def linear_after_flatten_kernel(w, torch_shape) -> np.ndarray:
    """Linear applied to a flattened feature map: permute the input axis
    from torch's channel-major flatten (C, ...) to channels-last.

    torch_shape: the UN-flattened torch input shape, e.g. (256, 7, 7) or
    (32, 4, 4, 4).  Returns (prod(shape), O) with input ordered as our
    (..., C) flatten.
    """
    w = _np(w)                                   # (O, C * prod(spatial))
    out = w.shape[0]
    w = w.reshape((out,) + tuple(torch_shape))   # (O, C, ...)
    nd = w.ndim
    w = np.transpose(w, (0,) + tuple(range(2, nd)) + (1,))  # (O, ..., C)
    return np.ascontiguousarray(w.reshape(out, -1).T)


def bn_affine(sd: Mapping[str, Any], prefix: str,
              eps: float = _BN_EPS) -> Dict[str, np.ndarray]:
    """Fold BatchNorm/FrozenBN parameters at `prefix` into {scale, bias}."""
    p = f"{prefix}." if prefix else ""
    gamma = _np(sd[f"{p}weight"])
    beta = _np(sd[f"{p}bias"])
    mean = _np(sd[f"{p}running_mean"])
    var = _np(sd[f"{p}running_var"])
    scale = gamma / np.sqrt(var + eps)
    return {"scale": scale, "bias": beta - mean * scale}


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load a .pth checkpoint; unwrap detectron2's {"model": ...} format."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model" in obj and isinstance(
            obj["model"], dict):
        obj = obj["model"]
    return dict(obj)


# ------------------------------------------------------- tracked consume


class _Consumer:
    """Wraps a state_dict; records which keys were read so the importer can
    assert full coverage (typo-proofing the mapping tables)."""

    def __init__(self, sd: Mapping[str, Any]):
        self.sd = dict(sd)
        self.used: set = set()

    def __contains__(self, key):
        return key in self.sd

    def get(self, key):
        self.used.add(key)
        return self.sd[key]

    def affine(self, prefix):
        for suffix in ("weight", "bias", "running_mean", "running_var"):
            self.used.add(f"{prefix}.{suffix}")
        return bn_affine(self.sd, prefix)

    def conv(self, prefix, bias=True):
        out = {"kernel": conv_kernel(self.get(f"{prefix}.weight"))}
        if bias:
            out["bias"] = _np(self.get(f"{prefix}.bias"))
        return out

    def conv_t(self, prefix, bias=True, out_bias_ch: int | None = None):
        """ConvTranspose; if the torch layer is bias-free but the flax
        module has a bias (ours always do), emit zeros of out_bias_ch."""
        out = {"kernel": conv_transpose_kernel(self.get(f"{prefix}.weight"))}
        if bias:
            out["bias"] = _np(self.get(f"{prefix}.bias"))
        elif out_bias_ch is not None:
            out["bias"] = np.zeros(out_bias_ch, np.float32)
        return out

    def dense(self, prefix):
        return {"kernel": linear_kernel(self.get(f"{prefix}.weight")),
                "bias": _np(self.get(f"{prefix}.bias"))}

    def leftover(self, scope_prefix: str = ""):
        skip = (".num_batches_tracked",)
        return sorted(k for k in self.sd
                      if k.startswith(scope_prefix) and k not in self.used
                      and not k.endswith(skip))


# ------------------------------------------------------------- detector


def _import_backbone(c: _Consumer, cfg: DetectionConfig) -> Dict[str, Any]:
    resnet: Dict[str, Any] = {
        "stem": {"kernel": conv_kernel(
            c.get("backbone.bottom_up.stem.conv1.weight"))},
        "stem_gn": c.affine("backbone.bottom_up.stem.conv1.norm"),
    }
    blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[cfg.backbone_depth]
    for stage, n_blocks in enumerate(blocks):
        for b in range(n_blocks):
            p = f"backbone.bottom_up.res{stage + 2}.{b}"
            blk: Dict[str, Any] = {}
            for i in range(3):
                blk[f"Conv_{i}"] = {"kernel": conv_kernel(
                    c.get(f"{p}.conv{i + 1}.weight"))}
                blk[f"AffineChannelNorm_{i}"] = c.affine(
                    f"{p}.conv{i + 1}.norm")
            if f"{p}.shortcut.weight" in c:
                blk["proj"] = {"kernel": conv_kernel(
                    c.get(f"{p}.shortcut.weight"))}
                blk["proj_gn"] = c.affine(f"{p}.shortcut.norm")
            resnet[f"res{stage + 2}_{b}"] = blk
    fpn: Dict[str, Any] = {}
    for i in range(4):
        fpn[f"lat{i + 2}"] = c.conv(f"backbone.fpn_lateral{i + 2}")
        fpn[f"post{i + 2}"] = c.conv(f"backbone.fpn_output{i + 2}")
    return {"resnet": resnet, "fpn": fpn}


def _import_rpn(c: _Consumer) -> Dict[str, Any]:
    p = "proposal_generator.rpn_head"
    return {"conv": c.conv(f"{p}.conv"),
            "objectness": c.conv(f"{p}.objectness_logits"),
            "deltas": c.conv(f"{p}.anchor_deltas")}


def _import_box_head(c: _Consumer, cfg: DetectionConfig) -> Dict[str, Any]:
    r = cfg.box_pooler_resolution
    ch = cfg.fpn_channels
    return {
        "fc1_kernel": linear_after_flatten_kernel(
            c.get("roi_heads.box_head.fc1.weight"), (ch, r, r)
        ).reshape(r, r, ch, -1),
        "fc1_bias": _np(c.get("roi_heads.box_head.fc1.bias")),
        "Dense_0": c.dense("roi_heads.box_head.fc2"),
        "cls": c.dense("roi_heads.box_predictor.cls_score"),
        "box": c.dense("roi_heads.box_predictor.bbox_pred"),
    }


def _import_mask_head(c: _Consumer) -> Dict[str, Any]:
    p = "roi_heads.mask_head"
    out = {f"Conv_{i}": c.conv(f"{p}.mask_fcn{i + 1}") for i in range(4)}
    out["ConvTranspose_0"] = c.conv_t(f"{p}.deconv")
    out["Conv_4"] = c.conv(f"{p}.predictor")
    return out


def _import_voxel_head(c: _Consumer) -> Dict[str, Any]:
    p = "roi_heads.voxel_head.decoder"
    widths = (512, 128, 32, 8, 1)
    out: Dict[str, Any] = {}
    for i, w in enumerate(widths):
        out[f"ConvTranspose_{i}"] = c.conv_t(f"{p}.layer{i + 1}.0",
                                             bias=False, out_bias_ch=w)
        if i < 4:  # layer5 has no BN
            out[f"AffineChannelNorm_{i}"] = c.affine(f"{p}.layer{i + 1}.1")
    return out


def _import_nocs_head(c: _Consumer, cfg: DetectionConfig) -> Dict[str, Any]:
    p = "roi_heads.nocs_head.nocs_layers"
    out: Dict[str, Any] = {}
    if cfg.nocs_use_bin_loss:
        # Towers in our instantiation order r, g, b == torch R, G, B; two
        # affines per tower created in (l1, l2) order.
        for t, ch in enumerate("RGB"):
            lo = ch.lower()
            out[f"l1_{lo}"] = c.conv_t(f"{p}.layer1_{ch}.0")
            out[f"AffineChannelNorm_{2 * t}"] = c.affine(
                f"{p}.layer1_{ch}.2")
            out[f"l2_{lo}"] = c.conv_t(f"{p}.layer2_{ch}.0")
            out[f"AffineChannelNorm_{2 * t + 1}"] = c.affine(
                f"{p}.layer2_{ch}.2")
            out[f"l3_{lo}"] = c.conv_t(f"{p}.layer3_{ch}.0")
    else:
        for i in range(4):
            out[f"ConvTranspose_{i}"] = c.conv_t(f"{p}.layer{i}.0")
            if i < 3:  # layer3 is ConvT + Sigmoid, no BN
                out[f"AffineChannelNorm_{i}"] = c.affine(f"{p}.layer{i}.2")
    return out


def import_config(cfg: DetectionConfig) -> DetectionConfig:
    """The DetectionConfig variant a detectron2 checkpoint was trained
    under: frozen-affine norms, torch view() voxel reshape, detectron2's
    anchor offset 0.0 (DefaultAnchorGenerator) so imported RPN deltas
    decode against exactly the anchors they saw in torch, and caffe-style
    stride placement (RESNETS.STRIDE_IN_1X1) so the imported backbone
    computes exactly detectron2's function."""
    import dataclasses
    return dataclasses.replace(cfg, norm="affine", voxel_torch_reshape=True,
                               anchor_offset=0.0, stride_in_1x1=True)


def import_detectron2_maskrcnn(state_dict: Mapping[str, Any],
                               cfg: DetectionConfig,
                               init_params: Mapping[str, Any] | None = None,
                               strict: bool = True) -> Dict[str, Any]:
    """detectron2 GeneralizedRCNN(+VoxelNocsHeads) state_dict -> MaskRCNN
    variables {"params": ...}.

    cfg must have norm="affine" and voxel_torch_reshape=True (the
    torch-parity model structure) at full reference widths.  With
    strict=False, sections absent from the checkpoint (e.g. voxel/NOCS
    heads in a COCO zoo detector) fall back to `init_params`
    (fresh-initialised params for the SAME cfg), enabling
    pretrained-backbone initialisation exactly like the reference's
    model-zoo start (`Detection/cfg_setup.py:21`).
    """
    if cfg.norm != "affine" or not cfg.voxel_torch_reshape:
        raise ValueError(
            "import requires cfg.norm='affine' and "
            "cfg.voxel_torch_reshape=True (torch-parity model structure)")
    if not cfg.stride_in_1x1 or cfg.anchor_offset != 0.0:
        raise ValueError(
            "import requires cfg.stride_in_1x1=True and "
            "cfg.anchor_offset=0.0 (use importers.torch_ckpt.import_config):"
            " detectron2 weights compute a different function under the "
            "torchvision stride placement / 0.5 anchor offset")
    if (cfg.backbone_width != 1.0 or cfg.head_width_mult != 1.0
            or cfg.fpn_channels != 256):
        raise ValueError("import only supports full reference widths")
    c = _Consumer(state_dict)
    init = dict(init_params["params"]) if init_params else {}

    def section(name, fn, probe_key):
        if probe_key in c:
            return fn()
        if strict:
            raise KeyError(f"checkpoint is missing section {name!r} "
                           f"(no {probe_key}); pass strict=False with "
                           "init_params to keep fresh init for it")
        if name not in init:
            raise KeyError(f"section {name!r} absent from both checkpoint "
                           "and init_params")
        return init[name]

    params = {
        "backbone": section(
            "backbone", lambda: _import_backbone(c, cfg),
            "backbone.bottom_up.stem.conv1.weight"),
        "rpn_head": section(
            "rpn_head", lambda: _import_rpn(c),
            "proposal_generator.rpn_head.conv.weight"),
        "box_head": section(
            "box_head", lambda: _import_box_head(c, cfg),
            "roi_heads.box_head.fc1.weight"),
        "mask_head": section(
            "mask_head", lambda: _import_mask_head(c),
            "roi_heads.mask_head.mask_fcn1.weight"),
    }
    if cfg.voxel_on:
        params["voxel_head"] = section(
            "voxel_head", lambda: _import_voxel_head(c),
            "roi_heads.voxel_head.decoder.layer1.0.weight")
    if cfg.nocs_on:
        probe = ("roi_heads.nocs_head.nocs_layers.layer1_R.0.weight"
                 if cfg.nocs_use_bin_loss
                 else "roi_heads.nocs_head.nocs_layers.layer0.0.weight")
        params["nocs_head"] = section(
            "nocs_head", lambda: _import_nocs_head(c, cfg), probe)

    if strict:
        extra = c.leftover()
        # detectron2 checkpoints carry anchor buffers / pixel stats we
        # intentionally don't consume.  Anchor buffers serialize under
        # 'proposal_generator.anchor_generator.cell_anchors.*' in older
        # detectron2 versions — match '.anchor_generator.' anywhere.
        extra = [k for k in extra
                 if not (k.startswith("pixel_")
                         or "anchor_generator." in k)]
        if extra:
            raise KeyError(f"unconsumed checkpoint keys: {extra[:8]}"
                           f"{' ...' if len(extra) > 8 else ''}")
    return {"params": params}


# ------------------------------------------------------------- tracking


def _import_mlp(c: _Consumer, prefix: str) -> Dict[str, Any]:
    """Reference MLP (`Tracking/networks/mlp.py`): Sequential of Linear
    (+activation/dropout) layers.  Collect the Linear layers by ascending
    index — robust to dropout presence shifting the indices."""
    idxs = sorted({int(k.split(".")[-2])
                   for k in c.sd
                   if k.startswith(f"{prefix}.layers.")
                   and k.endswith(".weight")})
    return {f"Dense_{i}": c.dense(f"{prefix}.layers.{j}")
            for i, j in enumerate(idxs)}


def import_tracking_modules(voxel_encoder_sd: Mapping[str, Any],
                            graph_net_sd: Mapping[str, Any],
                            edge_classifier_sd: Mapping[str, Any],
                            cfg: GraphConfig) -> Dict[str, Any]:
    """The reference's three tracking .pth state_dicts -> TrackerModel
    variables {"params": ...} (per-module files as saved/loaded by
    `Tracking/mpn_trainer.py:860-960`)."""
    cv = _Consumer(voxel_encoder_sd)
    venc = {f"Conv_{i}": cv.conv(name)
            for i, name in enumerate(("conv_in", "conv_0", "conv_1",
                                      "conv_2"))}
    # fc flattens torch's (32, 4, 4, 4) channel-major; ours is (4,4,4,32).
    venc["Dense_0"] = {
        "kernel": linear_after_flatten_kernel(cv.get("fc.weight"),
                                              (32, 4, 4, 4)),
        "bias": _np(cv.get("fc.bias"))}
    venc["Dense_1"] = cv.dense("fc2")

    cg = _Consumer(graph_net_sd)
    gnet: Dict[str, Any] = {
        "edge_encoder": _import_mlp(cg, "encoder.edge_mlp"),
        "edge_model": _import_mlp(cg, "MPNet.edge_model.edge_mlp"),
    }
    if cfg.time_aware_mp:
        gnet["flow_in"] = _import_mlp(cg, "MPNet.node_model.flow_in_mlp")
        gnet["flow_out"] = _import_mlp(cg, "MPNet.node_model.flow_out_mlp")
        gnet["node_fuse"] = _import_mlp(cg, "MPNet.node_model.node_mlp")
    else:
        gnet["node_model"] = _import_mlp(cg, "MPNet.node_model.node_mlp")

    ce = _Consumer(edge_classifier_sd)
    eclf = {"Dense_0": ce.dense("fc1"), "Dense_1": ce.dense("fc2")}

    for cons, name in ((cv, "voxel_encoder"), (cg, "graph_net"),
                       (ce, "edge_classifier")):
        extra = cons.leftover()
        if extra:
            raise KeyError(f"unconsumed {name} keys: {extra}")
    return {"params": {"voxel_encoder": venc, "graph_net": gnet,
                       "edge_classifier": eclf}}
