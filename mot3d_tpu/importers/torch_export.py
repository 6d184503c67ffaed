"""Flax MaskRCNN params -> detectron2-format state_dict (the inverse of
`importers/torch_ckpt.import_detectron2_maskrcnn`).

Why a framework needs the inverse direction:
  - checkpoint interchange BOTH ways with the reference's tooling — a
    detector trained here can be handed to users of the reference, whose
    entry points all consume detectron2-format `best_model.pth`
    (`/root/reference/Detection/cfg_setup.py:137`);
  - it makes the importer testable end-to-end without detectron2
    installed: export(random flax params) -> import == identity pins
    every layout-conversion table as exactly invertible
    (tests/test_torch_import.py), and the torch-mimic forward test runs
    the exported state_dict through plain-torch detectron2 semantics;
  - the pretrained-start protocol study (`examples/quality_study.py`)
    round-trips a fixture-pretrained backbone through the real .pth
    format, exercising the COCO-model-zoo partial-import path
    (`Detection/cfg_setup.py:21`) with a checkpoint of our own making.

Affine norms export as FrozenBatchNorm with running_mean=0 and
running_var=1-eps: detectron2's eval-time BN computes
gamma/sqrt(var+eps) * x + (beta - mean * ...), which with those stats
reduces to exactly our scale/bias — the roundtrip is bit-exact and any
torch consumer computes the same function.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from mot3d_tpu.config import DetectionConfig

_BN_EPS = 1e-5


def _np32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, np.float32))


def conv_kernel_inv(k: np.ndarray) -> np.ndarray:
    """flax (k..., I, O) -> torch Conv weight (O, I, k...)."""
    k = _np32(k)
    nd = k.ndim
    return np.ascontiguousarray(
        np.transpose(k, (nd - 1, nd - 2) + tuple(range(nd - 2))))


def conv_transpose_kernel_inv(k: np.ndarray) -> np.ndarray:
    """flax (k..., I, O) with flipped spatial axes -> torch
    ConvTranspose weight (I, O, k...)."""
    k = _np32(k)
    nd = k.ndim
    k = k[(slice(None, None, -1),) * (nd - 2)]       # unflip
    return np.ascontiguousarray(
        np.transpose(k, (nd - 2, nd - 1) + tuple(range(nd - 2))))


def linear_kernel_inv(k: np.ndarray) -> np.ndarray:
    """flax Dense kernel (I, O) -> torch Linear weight (O, I)."""
    return np.ascontiguousarray(_np32(k).T)


def linear_after_flatten_kernel_inv(k: np.ndarray,
                                    torch_shape) -> np.ndarray:
    """Inverse of linear_after_flatten_kernel: flax (prod, O) with
    channels-LAST input ordering -> torch (O, prod) channel-major.

    torch_shape: the un-flattened torch input shape, e.g. (256, 7, 7)."""
    k = _np32(k)
    out = k.shape[1]
    spatial = tuple(torch_shape[1:])
    ch = torch_shape[0]
    k = k.reshape(spatial + (ch, out))               # (..., C, O)
    nd = k.ndim
    k = np.transpose(k, (nd - 1, nd - 2) + tuple(range(nd - 2)))  # (O, C, ...)
    return np.ascontiguousarray(k.reshape(out, -1))


def _affine_to_bn(sd: Dict[str, Any], prefix: str, p: Mapping[str, Any]):
    scale, bias = _np32(p["scale"]), _np32(p["bias"])
    sd[f"{prefix}.weight"] = scale
    sd[f"{prefix}.bias"] = bias
    sd[f"{prefix}.running_mean"] = np.zeros_like(scale)
    sd[f"{prefix}.running_var"] = np.full_like(scale, 1.0 - _BN_EPS)


def _conv(sd, prefix, p, bias=True):
    sd[f"{prefix}.weight"] = conv_kernel_inv(p["kernel"])
    if bias:
        sd[f"{prefix}.bias"] = _np32(p["bias"])


def _conv_t(sd, prefix, p, bias=True):
    sd[f"{prefix}.weight"] = conv_transpose_kernel_inv(p["kernel"])
    if bias:
        sd[f"{prefix}.bias"] = _np32(p["bias"])


def _dense(sd, prefix, p):
    sd[f"{prefix}.weight"] = linear_kernel_inv(p["kernel"])
    sd[f"{prefix}.bias"] = _np32(p["bias"])


def export_detectron2_maskrcnn(variables: Mapping[str, Any],
                               cfg: DetectionConfig,
                               sections: tuple = ("backbone", "rpn_head",
                                                  "box_head", "mask_head",
                                                  "voxel_head",
                                                  "nocs_head")) -> Dict[str, Any]:
    """MaskRCNN variables (cfg.norm='affine', voxel_torch_reshape=True) ->
    detectron2-format state_dict of float32 numpy arrays (torch.save-able;
    `load_torch_state_dict` accepts numpy entries).

    `sections` restricts the export — ('backbone',) produces a
    COCO-zoo-style backbone-only checkpoint for the partial-import
    (pretrained start) protocol."""
    if cfg.norm != "affine" or not cfg.voxel_torch_reshape:
        raise ValueError("export requires cfg.norm='affine' and "
                         "cfg.voxel_torch_reshape=True (the torch-parity "
                         "model structure)")
    params = variables["params"]
    sd: Dict[str, Any] = {}

    if "backbone" in sections:
        bb = params["backbone"]
        resnet, fpn = bb["resnet"], bb["fpn"]
        sd["backbone.bottom_up.stem.conv1.weight"] = conv_kernel_inv(
            resnet["stem"]["kernel"])
        _affine_to_bn(sd, "backbone.bottom_up.stem.conv1.norm",
                      resnet["stem_gn"])
        blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[cfg.backbone_depth]
        for stage, n_blocks in enumerate(blocks):
            for b in range(n_blocks):
                blk = resnet[f"res{stage + 2}_{b}"]
                p = f"backbone.bottom_up.res{stage + 2}.{b}"
                for i in range(3):
                    sd[f"{p}.conv{i + 1}.weight"] = conv_kernel_inv(
                        blk[f"Conv_{i}"]["kernel"])
                    _affine_to_bn(sd, f"{p}.conv{i + 1}.norm",
                                  blk[f"AffineChannelNorm_{i}"])
                if "proj" in blk:
                    sd[f"{p}.shortcut.weight"] = conv_kernel_inv(
                        blk["proj"]["kernel"])
                    _affine_to_bn(sd, f"{p}.shortcut.norm", blk["proj_gn"])
        for i in range(4):
            _conv(sd, f"backbone.fpn_lateral{i + 2}", fpn[f"lat{i + 2}"])
            _conv(sd, f"backbone.fpn_output{i + 2}", fpn[f"post{i + 2}"])

    if "rpn_head" in sections:
        rp = params["rpn_head"]
        p = "proposal_generator.rpn_head"
        _conv(sd, f"{p}.conv", rp["conv"])
        _conv(sd, f"{p}.objectness_logits", rp["objectness"])
        _conv(sd, f"{p}.anchor_deltas", rp["deltas"])

    if "box_head" in sections:
        bh = params["box_head"]
        r, ch = cfg.box_pooler_resolution, cfg.fpn_channels
        sd["roi_heads.box_head.fc1.weight"] = \
            linear_after_flatten_kernel_inv(
                _np32(bh["fc1_kernel"]).reshape(r * r * ch, -1), (ch, r, r))
        sd["roi_heads.box_head.fc1.bias"] = _np32(bh["fc1_bias"])
        _dense(sd, "roi_heads.box_head.fc2", bh["Dense_0"])
        _dense(sd, "roi_heads.box_predictor.cls_score", bh["cls"])
        _dense(sd, "roi_heads.box_predictor.bbox_pred", bh["box"])

    if "mask_head" in sections:
        mh = params["mask_head"]
        p = "roi_heads.mask_head"
        for i in range(4):
            _conv(sd, f"{p}.mask_fcn{i + 1}", mh[f"Conv_{i}"])
        _conv_t(sd, f"{p}.deconv", mh["ConvTranspose_0"])
        _conv(sd, f"{p}.predictor", mh["Conv_4"])

    if "voxel_head" in sections and cfg.voxel_on:
        vh = params["voxel_head"]
        p = "roi_heads.voxel_head.decoder"
        for i in range(5):
            # torch layers are bias-free Conv3dTranspose; the flax zero
            # bias is dropped (the importer re-creates it as zeros).
            _conv_t(sd, f"{p}.layer{i + 1}.0", vh[f"ConvTranspose_{i}"],
                    bias=False)
            if i < 4:
                _affine_to_bn(sd, f"{p}.layer{i + 1}.1",
                              vh[f"AffineChannelNorm_{i}"])

    if "nocs_head" in sections and cfg.nocs_on:
        nh = params["nocs_head"]
        p = "roi_heads.nocs_head.nocs_layers"
        if cfg.nocs_use_bin_loss:
            for t, chn in enumerate("RGB"):
                lo = chn.lower()
                _conv_t(sd, f"{p}.layer1_{chn}.0", nh[f"l1_{lo}"])
                _affine_to_bn(sd, f"{p}.layer1_{chn}.2",
                              nh[f"AffineChannelNorm_{2 * t}"])
                _conv_t(sd, f"{p}.layer2_{chn}.0", nh[f"l2_{lo}"])
                _affine_to_bn(sd, f"{p}.layer2_{chn}.2",
                              nh[f"AffineChannelNorm_{2 * t + 1}"])
                _conv_t(sd, f"{p}.layer3_{chn}.0", nh[f"l3_{lo}"])
        else:
            for i in range(4):
                _conv_t(sd, f"{p}.layer{i}.0", nh[f"ConvTranspose_{i}"])
                if i < 3:
                    _affine_to_bn(sd, f"{p}.layer{i}.2",
                                  nh[f"AffineChannelNorm_{i}"])
    return sd


def save_torch_state_dict(path: str, sd: Mapping[str, Any]) -> None:
    """torch.save({'model': sd}) — detectron2's on-disk envelope."""
    import torch
    torch.save({"model": {k: torch.from_numpy(np.asarray(v))
                          for k, v in sd.items()}}, path)
