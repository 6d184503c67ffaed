"""NOCS loss vs the reference's ACTUAL full-canvas computation.

The rebuild's `nocs_sample_loss` samples the pred/GT box-overlap region on a
fixed 28x28 grid (deliberate deviation #3 in PARITY.md) instead of pasting
variable-size patches into 240x320 canvases (`Detection/roi_heads/
nocs_head.py:100-121`).  These tests bound that deviation numerically:

  - the symmetry losses are the reference's own `symmetry_smooth_l1_loss` /
    `symmetry_bin_loss` (`Detection/utils/train_utils.py:33-172`), extracted
    from the reference module by AST (the module itself imports detectron2,
    which is absent here) — NOT transcriptions;
  - the full-canvas protocol (aligned-bilinear patch resize -> integer-box
    paste -> overlap slice) is replicated in torch with `F.interpolate
    (align_corners=False)`, whose sampling convention equals detectron2's
    `roi_align(aligned=True)` over a whole patch.

Plus finite-difference gradient checks on the sampled loss (VERDICT r1
item 6: "check the overlap-sampling gradient against a full-canvas reference
computation on a tiny case").
"""

import ast
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mot3d_tpu.models.nocs_head import nocs_sample_loss

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref_symmetry_fns():
    """Load symmetry_{smooth_l1,bin}_loss from the reference source by AST
    (the module's own imports include detectron2/trimesh, absent here)."""
    src = open(os.path.join(
        REF, "Detection/utils/train_utils.py")).read()
    tree = ast.parse(src)
    ns = {"torch": torch, "plt": None}
    for node in tree.body:
        if (isinstance(node, ast.FunctionDef)
                and node.name in ("symmetry_smooth_l1_loss",
                                  "symmetry_bin_loss")):
            mod = ast.Module(body=[node], type_ignores=[])
            exec(compile(mod, "ref_train_utils", "exec"), ns)
    assert "symmetry_smooth_l1_loss" in ns
    return ns


def _smooth_field(h, w, x0, y0, freq=0.013):
    """Low-frequency NOCS-like field as a function of absolute image coords
    (so pred and GT crops of different boxes describe the same object)."""
    vs, us = np.meshgrid(np.arange(h) + y0, np.arange(w) + x0, indexing="ij")
    r = 0.5 + 0.4 * np.sin(freq * us + 0.3)
    g = 0.5 + 0.4 * np.cos(freq * vs - 0.1)
    b = 0.5 + 0.35 * np.sin(freq * (us + vs))
    return np.stack([r, g, b], -1).astype(np.float32)


def _crop_field(box, out=None):
    """Field sampled over an integer box, optionally resized (aligned
    bilinear) to a fixed out x out patch."""
    x0, y0, x1, y1 = (int(v) for v in box)
    patch = _smooth_field(y1 - y0, x1 - x0, x0, y0)
    if out is None:
        return patch
    t = torch.from_numpy(patch).permute(2, 0, 1)[None]
    t = F.interpolate(t, size=(out, out), mode="bilinear",
                      align_corners=False)
    return t[0].permute(1, 2, 0).numpy()


def _reference_full_canvas_loss(ref_fns, pred_patch, pred_box, gt_native,
                                gt_box, gt_cls, canvas=(240, 320)):
    """The reference nocs_loss inner computation
    (`Detection/roi_heads/nocs_head.py:100-121`): resize the 28x28 pred
    patch to the integer pred-box size, paste pred/GT into zero canvases,
    slice the overlap, run the reference symmetry loss."""
    px0, py0, px1, py1 = (int(v) for v in pred_box)
    gx0, gy0, gx1, gy1 = (int(v) for v in gt_box)
    pred_t = torch.from_numpy(np.asarray(pred_patch)).permute(2, 0, 1)[None]
    pred_resized = F.interpolate(pred_t, size=(py1 - py0, px1 - px0),
                                 mode="bilinear", align_corners=False)[0]
    full = torch.zeros(3, *canvas)
    full[:, py0:py1, px0:px1] = pred_resized
    gt_canvas = torch.zeros(3, *canvas)
    gt_canvas[:, gy0:gy1, gx0:gx1] = (
        torch.from_numpy(gt_native).permute(2, 0, 1))
    x_min, x_max = max(gx0, px0), min(gx1, px1)
    y_min, y_max = max(gy0, py0), min(gy1, py1)
    pred_overlap = full[:, y_min:y_max, x_min:x_max]
    gt_overlap = gt_canvas[:, y_min:y_max, x_min:x_max]
    return float(ref_fns["symmetry_smooth_l1_loss"](
        gt_overlap, pred_overlap, gt_cls=gt_cls))


class TestSampledLossVsFullCanvas:
    def test_asymmetric_class(self, ref_symmetry_fns):
        pred_box = np.array([40.0, 30.0, 104.0, 94.0])
        gt_box = np.array([50.0, 40.0, 110.0, 100.0])
        gt_native = _crop_field(gt_box)
        # Pred patch = same field + a smooth error, sampled on the pred box.
        pred_patch = np.clip(_crop_field(pred_box, out=28) + 0.07, 0, 1)

        ref = _reference_full_canvas_loss(
            ref_symmetry_fns, pred_patch, pred_box, gt_native, gt_box,
            "chair")
        ours, valid = nocs_sample_loss(
            jnp.asarray(pred_patch), jnp.asarray(_crop_field(gt_box, out=28)),
            jnp.asarray(pred_box), jnp.asarray(gt_box),
            jnp.asarray(False))
        assert bool(valid)
        assert ref == pytest.approx(float(ours), rel=0.08), (ref, float(ours))

    def test_symmetric_class_picks_rotation_min(self, ref_symmetry_fns):
        """'table' takes min over the 180-deg-Y-rotated GT
        (`train_utils.py:44-60`); construct a pred that matches the ROTATED
        GT so the rotation branch must win in both implementations."""
        pred_box = np.array([60.0, 50.0, 120.0, 110.0])
        gt_box = np.array([64.0, 52.0, 124.0, 112.0])
        gt_native = _crop_field(gt_box)
        # Rotated GT: (x,z) -> (-x,-z) about centre 0.5 on non-bg pixels.
        rot = gt_native.copy()
        rot[..., 0] = 1.0 - rot[..., 0]
        rot[..., 2] = 1.0 - rot[..., 2]
        t = torch.from_numpy(rot).permute(2, 0, 1)[None]
        gsz = (int(gt_box[3] - gt_box[1]), int(gt_box[2] - gt_box[0]))
        # pred box != gt box: re-crop the rotated field onto the pred box.
        rot_full = np.zeros((240, 320, 3), np.float32)
        rot_full[int(gt_box[1]):int(gt_box[3]),
                 int(gt_box[0]):int(gt_box[2])] = rot
        pred_native = rot_full[int(pred_box[1]):int(pred_box[3]),
                               int(pred_box[0]):int(pred_box[2])]
        pt = torch.from_numpy(pred_native).permute(2, 0, 1)[None]
        pred_patch = F.interpolate(pt, size=(28, 28), mode="bilinear",
                                   align_corners=False)[0].permute(
                                       1, 2, 0).numpy()
        del t, gsz

        ref_sym = _reference_full_canvas_loss(
            ref_symmetry_fns, pred_patch, pred_box, gt_native, gt_box,
            "table")
        ref_asym = _reference_full_canvas_loss(
            ref_symmetry_fns, pred_patch, pred_box, gt_native, gt_box,
            "chair")
        assert ref_sym < ref_asym  # rotation branch wins in the reference

        gt28 = jnp.asarray(_crop_field(gt_box, out=28))
        ours_sym, _ = nocs_sample_loss(
            jnp.asarray(pred_patch), gt28, jnp.asarray(pred_box),
            jnp.asarray(gt_box), jnp.asarray(True))
        ours_asym, _ = nocs_sample_loss(
            jnp.asarray(pred_patch), gt28, jnp.asarray(pred_box),
            jnp.asarray(gt_box), jnp.asarray(False))
        assert float(ours_sym) < float(ours_asym)
        assert ref_sym == pytest.approx(float(ours_sym), rel=0.12, abs=0.01)

    def test_disjoint_boxes_invalid(self, ref_symmetry_fns):
        ours, valid = nocs_sample_loss(
            jnp.zeros((28, 28, 3)), jnp.zeros((28, 28, 3)),
            jnp.asarray([0.0, 0.0, 20.0, 20.0]),
            jnp.asarray([100.0, 100.0, 120.0, 120.0]), jnp.asarray(False))
        assert not bool(valid) and float(ours) == 0.0


class TestSampledLossGradient:
    def test_matches_finite_differences(self):
        """The fixed-grid bilinear sampling must be differentiable in the
        pred patch with FD-exact gradients (VERDICT r1 item 6)."""
        rng = np.random.default_rng(0)
        # Spread pred/GT apart so the smooth-L1 is in its linear regime at
        # every probe: the FD secant through the |x|<beta kink would not
        # match the analytic gradient otherwise.
        pred = rng.uniform(0.6, 0.9, (28, 28, 3)).astype(np.float32)
        gt = rng.uniform(0.1, 0.4, (28, 28, 3)).astype(np.float32)
        pbox = jnp.asarray([40.0, 30.0, 104.0, 94.0])
        gbox = jnp.asarray([50.0, 40.0, 110.0, 100.0])

        f = jax.jit(lambda p: nocs_sample_loss(
            p, jnp.asarray(gt), pbox, gbox, jnp.asarray(False))[0])
        g = jax.grad(f)(jnp.asarray(pred))
        eps = 1e-2  # float32 FD
        for (i, j, c) in [(5, 7, 0), (14, 14, 1), (20, 9, 2), (26, 26, 0)]:
            p1, p2 = pred.copy(), pred.copy()
            p1[i, j, c] += eps
            p2[i, j, c] -= eps
            fd = (float(f(jnp.asarray(p1))) - float(f(jnp.asarray(p2)))) \
                / (2 * eps)
            assert float(g[i, j, c]) == pytest.approx(fd, rel=0.05,
                                                      abs=1e-6)

    def test_gradient_covers_overlap_region(self):
        """Every pred-patch pixel inside the overlap region must receive
        gradient (no dead pixels from the sampling scheme)."""
        rng = np.random.default_rng(1)
        pred = rng.uniform(0.2, 0.8, (28, 28, 3)).astype(np.float32)
        gt = rng.uniform(0.2, 0.8, (28, 28, 3)).astype(np.float32)
        pbox = jnp.asarray([40.0, 30.0, 104.0, 94.0])
        gbox = jnp.asarray([40.0, 30.0, 104.0, 94.0])  # full overlap

        g = jax.grad(lambda p: nocs_sample_loss(
            p, jnp.asarray(gt), pbox, gbox, jnp.asarray(False))[0])(
                jnp.asarray(pred))
        nonzero = float((jnp.abs(g).sum(-1) > 0).mean())
        assert nonzero > 0.95, f"only {nonzero:.0%} of pixels get gradient"
