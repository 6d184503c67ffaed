"""Oracle tests: batch-native detector ops vs the per-image versions.

The batched layouts (`gather_rows`, `nms_mask_batched`,
`batched_nms_mask_batched`, `multilevel_roi_align_batched`,
`select_proposals_batched`) exist purely for TPU performance (flat gathers
instead of vmap's batched gathers — see NOTES_ROUND2.md, detector batching
study); each must reproduce the per-image op bit-exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mot3d_tpu.models.rpn import (generate_anchors, level_slices,
                                  select_proposals,
                                  select_proposals_batched)
from mot3d_tpu.ops.nms import (batched_nms_mask, batched_nms_mask_batched,
                               gather_rows, nms_mask, nms_mask_batched)
from mot3d_tpu.ops.roi_align import (multilevel_roi_align,
                                     multilevel_roi_align_batched,
                                     multilevel_roi_align_batched_mm,
                                     multilevel_roi_align_batched_packed,
                                     multilevel_roi_align_mm,
                                     multilevel_roi_align_packed)

STRIDES = (4, 8, 16, 32)


def _random_boxes(rng, b, k, hw=(64.0, 80.0)):
    h, w = hw
    x0 = rng.uniform(0, w - 8, (b, k))
    y0 = rng.uniform(0, h - 8, (b, k))
    bw = rng.uniform(2, 24, (b, k))
    bh = rng.uniform(2, 24, (b, k))
    return np.stack([x0, y0, np.minimum(x0 + bw, w),
                     np.minimum(y0 + bh, h)], axis=-1).astype(np.float32)


def test_gather_rows_matches_take_along_axis():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 11, 5, 2)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 11, size=(3, 7)).astype(np.int32))
    got = gather_rows(x, idx)
    want = jnp.take_along_axis(x, idx[:, :, None, None], axis=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("exact", [True, False])
def test_nms_mask_batched_matches_per_image(exact):
    rng = np.random.default_rng(1)
    b, k = 4, 37
    boxes = jnp.asarray(_random_boxes(rng, b, k))
    scores = jnp.asarray(rng.uniform(size=(b, k)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=(b, k)) > 0.2)
    got = nms_mask_batched(boxes, scores, valid, 0.5, exact)
    for i in range(b):
        want = nms_mask(boxes[i], scores[i], valid[i], 0.5, exact)
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(want))


@pytest.mark.parametrize("shared_idxs", [True, False])
def test_batched_nms_mask_batched_matches_per_image(shared_idxs):
    rng = np.random.default_rng(2)
    b, k = 3, 29
    boxes = jnp.asarray(_random_boxes(rng, b, k))
    scores = jnp.asarray(rng.uniform(size=(b, k)).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=(b, k)) > 0.15)
    if shared_idxs:
        idxs = jnp.asarray(rng.integers(0, 4, size=(k,)).astype(np.int32))
        per_image_idxs = [idxs] * b
    else:
        idxs = jnp.asarray(rng.integers(0, 4, size=(b, k)).astype(np.int32))
        per_image_idxs = [idxs[i] for i in range(b)]
    got = batched_nms_mask_batched(boxes, scores, idxs, valid, 0.4)
    for i in range(b):
        want = batched_nms_mask(boxes[i], scores[i], per_image_idxs[i],
                                valid[i], 0.4)
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(want))


def test_multilevel_roi_align_batched_matches_per_image():
    rng = np.random.default_rng(3)
    b, n, c = 3, 9, 6
    hw = (64, 80)
    feats = [jnp.asarray(rng.normal(size=(
        b, hw[0] // s, hw[1] // s, c)).astype(np.float32)) for s in STRIDES]
    boxes = jnp.asarray(_random_boxes(rng, b, n, (float(hw[0]),
                                                  float(hw[1]))))
    # Mix in some large boxes so several FPN levels are exercised.
    big = jnp.asarray([[2.0, 2.0, 78.0, 60.0]], jnp.float32)
    boxes = boxes.at[:, 0].set(big[0])
    got = multilevel_roi_align_batched(feats, boxes, 7, STRIDES)
    for i in range(b):
        want = multilevel_roi_align([f[i] for f in feats], boxes[i], 7,
                                    STRIDES)
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(want))


@pytest.mark.parametrize("out_size", [7, 14])
def test_multilevel_roi_align_mm_matches_gather(out_size):
    """The separable-matmul ROIAlign (the MXU path used by MaskRCNN) must
    reproduce the gather formulation to float tolerance."""
    rng = np.random.default_rng(5)
    n, c = 23, 6
    img_hw = (256, 320)
    feats = [jnp.asarray(rng.normal(size=(
        img_hw[0] // s, img_hw[1] // s, c)).astype(np.float32))
        for s in STRIDES]
    x0 = rng.uniform(0, 300, n)
    y0 = rng.uniform(0, 240, n)
    bw = rng.uniform(4, 220, n)
    bh = rng.uniform(4, 220, n)
    boxes = jnp.asarray(np.stack(
        [x0, y0, np.minimum(x0 + bw, img_hw[1]),
         np.minimum(y0 + bh, img_hw[0])], -1).astype(np.float32))
    # Include a partially out-of-image box (zero-weight region semantics).
    boxes = boxes.at[0].set(jnp.asarray([-8.0, -4.0, 30.0, 22.0]))
    want = multilevel_roi_align(feats, boxes, out_size, STRIDES)
    got = multilevel_roi_align_mm(feats, boxes, out_size, STRIDES)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("out_size", [7, 14])
def test_multilevel_roi_align_packed_matches_gather(out_size):
    """The packed-pyramid matmul ROIAlign (the production MaskRCNN pooler)
    must reproduce the gather formulation: same bilinear semantics, level
    assignment folded into the packed one-hot weights."""
    rng = np.random.default_rng(7)
    n, c = 31, 6
    img_hw = (256, 320)
    feats = [jnp.asarray(rng.normal(size=(
        img_hw[0] // s, img_hw[1] // s, c)).astype(np.float32))
        for s in STRIDES]
    x0 = rng.uniform(0, 300, n)
    y0 = rng.uniform(0, 240, n)
    bw = rng.uniform(4, 220, n)
    bh = rng.uniform(4, 220, n)
    boxes = np.stack(
        [x0, y0, np.minimum(x0 + bw, img_hw[1]),
         np.minimum(y0 + bh, img_hw[0])], -1).astype(np.float32)
    # Partially out-of-image (zero-weight region), a whole-image level-5
    # box, and a degenerate tiny box.
    boxes[0] = [-8.0, -4.0, 30.0, 22.0]
    boxes[1] = [0.0, 0.0, 320.0, 256.0]
    boxes[2] = [50.0, 50.0, 50.5, 50.5]
    boxes = jnp.asarray(boxes)
    want = multilevel_roi_align(feats, boxes, out_size, STRIDES)
    got = multilevel_roi_align_packed(feats, boxes, out_size, STRIDES)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-4)


def test_multilevel_roi_align_batched_packed_matches_per_image():
    rng = np.random.default_rng(8)
    b, n, c = 3, 9, 4
    img_hw = (64, 80)
    feats = [jnp.asarray(rng.normal(size=(
        b, img_hw[0] // s, img_hw[1] // s, c)).astype(np.float32))
        for s in STRIDES]
    boxes = jnp.asarray(_random_boxes(rng, b, n, (float(img_hw[0]),
                                                  float(img_hw[1]))))
    got = multilevel_roi_align_batched_packed(feats, boxes, 7, STRIDES)
    for i in range(b):
        want = multilevel_roi_align_packed([f[i] for f in feats], boxes[i],
                                           7, STRIDES)
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(want),
                                   atol=1e-6)


def test_multilevel_roi_align_batched_mm_matches_per_image():
    rng = np.random.default_rng(6)
    b, n, c = 3, 9, 4
    img_hw = (64, 80)
    feats = [jnp.asarray(rng.normal(size=(
        b, img_hw[0] // s, img_hw[1] // s, c)).astype(np.float32))
        for s in STRIDES]
    boxes = jnp.asarray(_random_boxes(rng, b, n, (float(img_hw[0]),
                                                  float(img_hw[1]))))
    got = multilevel_roi_align_batched_mm(feats, boxes, 7, STRIDES)
    for i in range(b):
        want = multilevel_roi_align_mm([f[i] for f in feats], boxes[i], 7,
                                       STRIDES)
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(want),
                                   atol=1e-6)


@pytest.mark.parametrize("exact", [True, False])
def test_select_proposals_batched_matches_per_image(exact):
    rng = np.random.default_rng(4)
    h, w = 64, 80
    ratios = (0.5, 1.0, 2.0)
    sizes = (8, 16, 32, 64, 128)
    strides = (4, 8, 16, 32, 64)
    anchors = jnp.asarray(generate_anchors(h, w, sizes, ratios, strides))
    slices = level_slices(h, w, len(ratios), strides)
    n = anchors.shape[0]
    bsz = 3
    objness = jnp.asarray(rng.normal(size=(bsz, n)).astype(np.float32))
    deltas = jnp.asarray(
        (rng.normal(size=(bsz, n, 4)) * 0.1).astype(np.float32))
    got = select_proposals_batched(anchors, objness, deltas, slices, (h, w),
                                   64, 32, 0.7, exact)
    for i in range(bsz):
        want = select_proposals(anchors, objness[i], deltas[i], slices,
                                (h, w), 64, 32, 0.7, exact)
        for g, wnt in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g[i]), np.asarray(wnt))
