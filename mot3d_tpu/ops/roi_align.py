"""ROIAlign over an FPN pyramid as one XLA gather pass.

TPU-native replacement for detectron2's CUDA ROIAlign
(`Detection/roi_heads/roi_heads.py:59-97` poolers; also reused for NOCS patch
resizing at `Detection/roi_heads/nocs_head.py:83,105` and
`Detection/tracker/postprocess.py:145`).

Design: instead of detectron2's per-level pooling with dynamic box
partitioning, all levels are flattened into one (sum_l H_l * W_l, C) row
matrix; each box computes its FPN level (the standard
floor(4 + log2(sqrt(area)/224)) rule), its bilinear sample coordinates in
that level's grid, and gathers rows directly — static shapes, one gather,
no per-level scatter/compaction.  Semantics are detectron2 ROIAlignV2
(`aligned=True`): half-pixel offset, `sampling_ratio` x `sampling_ratio`
sample points per output bin (default 2, matching sampling_ratio=0 for
typical box sizes), average-pooled, zero outside the feature map.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_weights(coord, size):
    """coord: fractional positions (...,); size: extent of that axis.
    Returns (idx0, idx1, w0, w1) with zero weight outside [-1, size)."""
    valid = jnp.logical_and(coord > -1.0, coord < size)
    c = jnp.clip(coord, 0.0, size - 1.0)
    i0 = jnp.floor(c)
    i1 = jnp.minimum(i0 + 1, size - 1)
    w1 = c - i0
    w0 = 1.0 - w1
    w0 = jnp.where(valid, w0, 0.0)
    w1 = jnp.where(valid, w1, 0.0)
    return i0.astype(jnp.int32), i1.astype(jnp.int32), w0, w1


def roi_align(feature: jax.Array, boxes: jax.Array, output_size: int,
              spatial_scale: float = 1.0, sampling_ratio: int = 2) -> jax.Array:
    """ROIAlign on a single feature map.

    feature: (H, W, C); boxes: (N, 4) XYXY in image coords.
    Returns (N, output_size, output_size, C).
    """
    h, w, c = feature.shape
    out = output_size
    s = sampling_ratio

    b = boxes * spatial_scale - 0.5  # aligned=True half-pixel offset
    x0, y0, x1, y1 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    bw = x1 - x0
    bh = y1 - y0
    bin_w = bw / out
    bin_h = bh / out

    # Sample grid: (out, s) offsets within the roi, broadcast over boxes.
    cell = (jnp.arange(out)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s)  # (out, s)
    ys = y0[:, None, None] + cell[None] * bin_h[:, None, None]  # (N, out, s)
    xs = x0[:, None, None] + cell[None] * bin_w[:, None, None]

    iy0, iy1, wy0, wy1 = _bilinear_weights(ys, h)
    ix0, ix1, wx0, wx1 = _bilinear_weights(xs, w)

    flat = feature.reshape(h * w, c)

    def gather(iy, ix):
        # (N, out, s) x (N, out, s) -> (N, out, s, out, s, C)
        idx = iy[:, :, :, None, None] * w + ix[:, None, None, :, :]
        return flat[idx.reshape(idx.shape[0], -1)].reshape(
            idx.shape + (c,))

    wy = (wy0, wy1)
    wx = (wx0, wx1)
    acc = 0.0
    for a, iy in enumerate((iy0, iy1)):
        for bxi, ix in enumerate((ix0, ix1)):
            val = gather(iy, ix)
            wgt = (wy[a][:, :, :, None, None] * wx[bxi][:, None, None, :, :])
            acc = acc + val * wgt[..., None]
    # Average over the s x s sample points -> (N, out, out, C).
    return acc.mean(axis=(2, 4))


def roi_align_matmul(feature: jax.Array, boxes: jax.Array, output_size: int,
                     spatial_scale: float = 1.0,
                     sampling_ratio: int = 2) -> jax.Array:
    """Single-level ROIAlign as two separable weight MATMULS (MXU form).

    Identical semantics to `roi_align` (ROIAlignV2, aligned=True): the op
    is linear in the feature map and separable per axis, so the subsample
    mean and bilinear corners fold into one dense (N, out, size) weight
    matrix per axis and the pool becomes W_y @ F @ W_x^T per box — MXU
    matmuls instead of (N, out, s, out, s, C) HBM gathers.  The gather
    form was the mask-target hot spot in the train step: full-res
    (256, 320, M) GT-mask pooling over the foreground buffer
    (examples/train_profile.py, round 4).  feature (H, W, C),
    boxes (N, 4) XYXY -> (N, out, out, C).
    """
    h, w, _ = feature.shape
    b = boxes * spatial_scale - 0.5  # aligned=True half-pixel offset
    ry = _separable_roi_weights(b[:, 1], b[:, 3], output_size,
                                sampling_ratio, h)    # (N, out, H)
    cx = _separable_roi_weights(b[:, 0], b[:, 2], output_size,
                                sampling_ratio, w)    # (N, out, W)
    rows = jnp.einsum("nih,hwc->niwc", ry, feature)
    return jnp.einsum("niwc,njw->nijc", rows, cx)


def _separable_roi_weights(lo: jax.Array, hi: jax.Array, out: int, s: int,
                           size) -> jax.Array:
    """Combined ROIAlignV2 interpolation weights for one axis.

    ROIAlign is linear in the feature map and separable per axis: the mean
    over the `s` subsamples of a bin and the two bilinear corners collapse
    into ONE dense weight matrix W with
        pooled[n, i] = sum_y W[n, i, y] * F[n, y]
    lo/hi: (N,) box extent in level coords (already offset by -0.5);
    returns (N, out, size).
    """
    n = lo.shape[0]
    cell = (jnp.arange(out)[:, None]
            + (jnp.arange(s)[None, :] + 0.5) / s)               # (out, s)
    bin_sz = (hi - lo) / out
    pos = lo[:, None, None] + cell[None] * bin_sz[:, None, None]  # (N,out,s)
    i0, i1, w0, w1 = _bilinear_weights(pos, size)
    iota = jnp.arange(int(np.max(size)) if np.ndim(size) else int(size))
    oh0 = (i0[..., None] == iota).astype(w0.dtype) * w0[..., None]
    oh1 = (i1[..., None] == iota).astype(w1.dtype) * w1[..., None]
    return (oh0 + oh1).sum(axis=2) / s                          # (N,out,size)


def multilevel_roi_align_mm(features: Sequence[jax.Array], boxes: jax.Array,
                            output_size: int, strides: Sequence[int],
                            min_level: int = 2,
                            sampling_ratio: int = 2) -> jax.Array:
    """Matmul formulation of `multilevel_roi_align` (identical semantics).

    The gather formulation moves ~(N * (out*s)^2 * 4 * C) feature elements
    through random HBM gathers — measured at ~80 ms of the 126 ms batch-25
    detector forward on v5e.  ROIAlign is linear and separable, so each
    box's pooled patch is exactly
        Ry[n] (out, H_l) @ F_l (H_l, W_l, C) @ Rx[n]^T (W_l, out)
    two MXU matmuls against dense per-axis weight matrices.  Every box is
    pooled at EVERY level (the geometric level sizes make this only ~1.33x
    the single-level FLOPs) and the per-box FPN level picks the result —
    data-dependent level assignment with static shapes and no gathers.

    Superseded as the production pooler by `multilevel_roi_align_packed`
    (1.5x: one packed-pyramid einsum pair, no per-level intermediates or
    stack+select); kept as the readable intermediate oracle.
    """
    n = boxes.shape[0]
    n_levels = len(features)
    li = assign_fpn_level(boxes, min_level, min_level + n_levels - 1) \
        - min_level                                              # (N,)
    out = output_size
    pooled_per_level = []
    for l, (f, stride) in enumerate(zip(features, strides)):
        h, w, _ = f.shape
        b = boxes / float(stride) - 0.5
        ry = _separable_roi_weights(b[:, 1], b[:, 3], out, sampling_ratio, h)
        rx = _separable_roi_weights(b[:, 0], b[:, 2], out, sampling_ratio, w)
        t1 = jnp.einsum("nph,hwc->npwc", ry.astype(f.dtype), f)
        pooled_per_level.append(
            jnp.einsum("npwc,nqw->npqc", t1, rx.astype(f.dtype)))
    sel = jnp.stack(pooled_per_level)                # (L, N, out, out, C)
    onehot = (jnp.arange(n_levels)[:, None] == li[None, :]).astype(sel.dtype)
    return jnp.einsum("ln,ln...->n...", onehot, sel)


def _packed_roi_weights(lo: jax.Array, hi: jax.Array, out: int, s: int,
                        sizes: jax.Array, offsets: jax.Array,
                        total: int) -> jax.Array:
    """`_separable_roi_weights` against a PACKED axis.

    lo/hi: (N,) box extent in each box's own level coords (already -0.5
    offset); sizes: (N,) that level's extent on this axis; offsets: (N,)
    int32 start row of that level inside the packed axis; total: packed
    axis length.  Rows of other levels get exactly zero weight (the
    one-hot only hits [offset, offset + size)), so a matmul against the
    packed feature map performs the per-level pooling AND the FPN level
    selection in one pass.  Returns (N, out, total).
    """
    cell = (jnp.arange(out)[:, None]
            + (jnp.arange(s)[None, :] + 0.5) / s)               # (out, s)
    bin_sz = (hi - lo) / out
    pos = lo[:, None, None] + cell[None] * bin_sz[:, None, None]  # (N,out,s)
    i0, i1, w0, w1 = _bilinear_weights(pos, sizes[:, None, None])
    iota = jnp.arange(total)
    off = offsets[:, None, None, None]
    oh0 = ((i0[..., None] + off) == iota).astype(w0.dtype) * w0[..., None]
    oh1 = ((i1[..., None] + off) == iota).astype(w1.dtype) * w1[..., None]
    return (oh0 + oh1).sum(axis=2) / s                          # (N,out,total)


def multilevel_roi_align_packed(features: Sequence[jax.Array],
                                boxes: jax.Array, output_size: int,
                                strides: Sequence[int], min_level: int = 2,
                                sampling_ratio: int = 2) -> jax.Array:
    """Packed-pyramid matmul ROIAlign (identical semantics, ~2x the speed).

    `multilevel_roi_align_mm` pools every box at every level and one-hot
    selects the result; its cost on TPU is dominated by HBM traffic — the
    (N, out, W_l, C) einsum intermediate is written+read per level and the
    (L, N, out, out, C) stack is materialised for the select.  Here the
    pyramid is packed into ONE (sum_l H_l, max_l W_l, C) map (levels
    stacked along y, x zero-padded) and each box's separable weights are
    built against the packed axes at its own level's row offset — so one
    einsum pair pools AND level-selects everything: a single
    single-level-sized intermediate, no stack, no select.
    """
    c = features[0].shape[-1]
    dims = np.array([(f.shape[0], f.shape[1]) for f in features])
    w_max = int(dims[:, 1].max())
    h_tot = int(dims[:, 0].sum())
    yoffs = np.concatenate([[0], np.cumsum(dims[:, 0])[:-1]])
    packed = jnp.concatenate(
        [jnp.pad(f, ((0, 0), (0, w_max - f.shape[1]), (0, 0)))
         for f in features], axis=0)                 # (h_tot, w_max, C)

    n_levels = len(features)
    li = assign_fpn_level(boxes, min_level, min_level + n_levels - 1) \
        - min_level                                              # (N,)
    h_l = jnp.asarray(dims[:, 0], jnp.float32)[li]
    w_l = jnp.asarray(dims[:, 1], jnp.float32)[li]
    yoff = jnp.asarray(yoffs, jnp.int32)[li]
    stride_l = jnp.asarray(np.asarray(strides, np.float32))[li]

    out, s = output_size, sampling_ratio
    b = boxes / stride_l[:, None] - 0.5
    ry = _packed_roi_weights(b[:, 1], b[:, 3], out, s, h_l, yoff, h_tot)
    rx = _packed_roi_weights(b[:, 0], b[:, 2], out, s, w_l,
                             jnp.zeros_like(yoff), w_max)
    t1 = jnp.einsum("nph,hwc->npwc", ry.astype(packed.dtype), packed)
    return jnp.einsum("npwc,nqw->npqc", t1, rx.astype(t1.dtype))


def multilevel_roi_align_batched_packed(features: Sequence[jax.Array],
                                        boxes: jax.Array, output_size: int,
                                        strides: Sequence[int],
                                        min_level: int = 2,
                                        sampling_ratio: int = 2) -> jax.Array:
    """Batched packed ROIAlign: vmap of `multilevel_roi_align_packed`
    (batched einsums are native batched matmuls on the MXU)."""
    return jax.vmap(
        lambda fs, bx: multilevel_roi_align_packed(
            list(fs), bx, output_size, strides, min_level, sampling_ratio)
    )(tuple(features), boxes)


def multilevel_roi_align_batched_mm(features: Sequence[jax.Array],
                                    boxes: jax.Array, output_size: int,
                                    strides: Sequence[int],
                                    min_level: int = 2,
                                    sampling_ratio: int = 2) -> jax.Array:
    """Batched matmul ROIAlign: vmap of `multilevel_roi_align_mm`.

    features: list of (B, H_l, W_l, C); boxes (B, N, 4).  Unlike the gather
    formulation (whose vmap lowers to slow batched gathers), a vmapped
    einsum is just a batched matmul — native on the MXU."""
    return jax.vmap(
        lambda fs, bx: multilevel_roi_align_mm(
            list(fs), bx, output_size, strides, min_level, sampling_ratio)
    )(tuple(features), boxes)


def assign_fpn_level(boxes: jax.Array, min_level: int = 2, max_level: int = 5,
                     canonical_size: float = 224.0,
                     canonical_level: int = 4) -> jax.Array:
    """Box -> FPN level via floor(L0 + log2(sqrt(area)/224)) (FPN paper rule,
    as detectron2 poolers)."""
    area = jnp.clip(boxes[:, 2] - boxes[:, 0], 0) * jnp.clip(boxes[:, 3] - boxes[:, 1], 0)
    scale = jnp.sqrt(jnp.maximum(area, 1e-12))
    lvl = jnp.floor(canonical_level + jnp.log2(scale / canonical_size + 1e-12))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


def multilevel_roi_align(features: Sequence[jax.Array], boxes: jax.Array,
                         output_size: int, strides: Sequence[int],
                         min_level: int = 2,
                         sampling_ratio: int = 2) -> jax.Array:
    """ROIAlign over a feature pyramid via one flattened gather.

    features: list of (H_l, W_l, C), finest first; strides: image stride of
    each level.  boxes: (N, 4) XYXY image coords.
    Returns (N, output_size, output_size, C).
    """
    c = features[0].shape[-1]
    dims = np.array([(f.shape[0], f.shape[1]) for f in features])
    flat = jnp.concatenate([f.reshape(-1, c) for f in features], axis=0)
    base = jnp.zeros((boxes.shape[0],), jnp.int32)
    return _flat_multilevel_roi_align(flat, dims, base, boxes, output_size,
                                      strides, min_level, sampling_ratio)


def multilevel_roi_align_batched(features: Sequence[jax.Array],
                                 boxes: jax.Array, output_size: int,
                                 strides: Sequence[int], min_level: int = 2,
                                 sampling_ratio: int = 2) -> jax.Array:
    """Batched multilevel ROIAlign: ONE flat gather for the whole batch.

    features: list of (B, H_l, W_l, C); boxes: (B, N, 4) XYXY image coords.
    Returns (B, N, output_size, output_size, C).

    Wrapping the per-image version in `jax.vmap` gives a *batched* gather
    (operand batch dims), which XLA lowers far less efficiently on TPU than
    a plain flat gather (+50% detector latency measured at batch 25).  Here
    the whole batch's pyramids are concatenated row-major into one
    (B * sum_l H_l W_l, C) matrix and each box's indices get its image's
    page offset — identical math, single flat gather."""
    bsz, n = boxes.shape[:2]
    c = features[0].shape[-1]
    dims = np.array([(f.shape[1], f.shape[2]) for f in features])
    page = int((dims[:, 0] * dims[:, 1]).sum())
    flat = jnp.concatenate([f.reshape(bsz, -1, c) for f in features],
                           axis=1).reshape(bsz * page, c)
    base = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32) * page, n)
    out = _flat_multilevel_roi_align(flat, dims, base, boxes.reshape(-1, 4),
                                     output_size, strides, min_level,
                                     sampling_ratio)
    return out.reshape((bsz, n) + out.shape[1:])


def _flat_multilevel_roi_align(flat, dims, base, boxes, output_size, strides,
                               min_level, sampling_ratio):
    """Core: gather from a flattened pyramid `flat` (rows, C) with
    per-box extra row offset `base` (N,)."""
    c = flat.shape[-1]
    offsets = np.concatenate([[0], np.cumsum(dims[:, 0] * dims[:, 1])])
    n_levels = len(dims)
    lvl = assign_fpn_level(boxes, min_level, min_level + n_levels - 1)
    li = lvl - min_level
    h_l = jnp.asarray(dims[:, 0])[li].astype(jnp.float32)   # (N,)
    w_l = jnp.asarray(dims[:, 1])[li].astype(jnp.float32)
    off_l = jnp.asarray(offsets[:-1])[li] + base            # (N,)
    stride_l = jnp.asarray(np.asarray(strides, np.float32))[li]

    out, s = output_size, sampling_ratio
    b = boxes / stride_l[:, None] - 0.5
    x0, y0 = b[:, 0], b[:, 1]
    bin_w = (b[:, 2] - x0) / out
    bin_h = (b[:, 3] - y0) / out

    cell = (jnp.arange(out)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s)
    ys = y0[:, None, None] + cell[None] * bin_h[:, None, None]
    xs = x0[:, None, None] + cell[None] * bin_w[:, None, None]

    iy0, iy1, wy0, wy1 = _bilinear_weights(ys, h_l[:, None, None])
    ix0, ix1, wx0, wx1 = _bilinear_weights(xs, w_l[:, None, None])

    wint = jnp.asarray(dims[:, 1])[li]  # integer row width per box

    def gather(iy, ix):
        idx = (off_l[:, None, None, None, None]
               + iy[:, :, :, None, None] * wint[:, None, None, None, None]
               + ix[:, None, None, :, :])
        n = idx.shape[0]
        return flat[idx.reshape(n, -1)].reshape(idx.shape + (c,))

    wy = (wy0, wy1)
    wx = (wx0, wx1)
    acc = 0.0
    for a, iy in enumerate((iy0, iy1)):
        for bxi, ix in enumerate((ix0, ix1)):
            val = gather(iy, ix)
            wgt = (wy[a][:, :, :, None, None] * wx[bxi][:, None, None, :, :])
            acc = acc + val * wgt[..., None]
    return acc.mean(axis=(2, 4))
