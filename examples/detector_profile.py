"""Stage-level latency breakdown of MaskRCNN.predict at sequence batch.

Measurement pattern for the tunnelled TPU (see NOTES_ROUND2.md): each stage
is its own jit program whose output is reduced to ONE scalar fetched with
float() — a real data dependency through the tunnel.  Warmup runs on input
A, the timed call on input B (repeated identical dispatches are deduped by
the relay), and the trivial-program RTT is measured first so stage times
can be read net of the ~36 ms round trip.
"""

import dataclasses
import sys
import time

import numpy as np

from mot3d_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from mot3d_tpu.config import default_config
from mot3d_tpu.models.mask_rcnn import STRIDES, MaskRCNN
from mot3d_tpu.models.rpn import select_proposals
from mot3d_tpu.ops.roi_align import (multilevel_roi_align,
                                     multilevel_roi_align_packed)

T = 25


def main():
    cfg = default_config()
    dcfg = dataclasses.replace(cfg.detection, compute_dtype="bfloat16")
    model = MaskRCNN(dcfg)
    rng = np.random.default_rng(0)
    imgs = [jnp.asarray(rng.uniform(0, 255, (T, dcfg.pad_height,
                                             dcfg.pad_width, 3)),
                        jnp.float32) for _ in range(2)]
    params = jax.jit(lambda k: model.init(
        k, imgs[0], method=MaskRCNN.predict))(jax.random.PRNGKey(0))
    print("devices:", jax.devices(), file=sys.stderr)

    triv = jax.jit(lambda x: x.sum())
    _ = float(triv(imgs[0]))
    t0 = time.perf_counter()
    _ = float(triv(imgs[1]))
    rtt = time.perf_counter() - t0
    print(f"{'trivial RTT':>28}: {rtt * 1e3:7.1f} ms", file=sys.stderr,
          flush=True)

    def timed(name, method):
        fn = jax.jit(lambda p, im: model.apply(p, im, method=method))
        _ = float(fn(params, imgs[0]))                   # compile + warm
        t0 = time.perf_counter()
        _ = float(fn(params, imgs[1]))                   # timed, varied input
        dt = time.perf_counter() - t0
        print(f"{name:>28}: {dt * 1e3:7.1f} ms  "
              f"(net {max(dt - rtt, 0) * 1e3:6.1f} ms)",
              file=sys.stderr, flush=True)
        return dt

    def scalar(tree):
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(tree)
                   if jnp.issubdtype(x.dtype, jnp.floating))

    timed("full predict",
          lambda m, x: scalar(m.predict(x)))
    timed("backbone",
          lambda m, x: scalar(m.backbone(m._normalise(x))))
    timed("backbone+rpn_head",
          lambda m, x: scalar(m.rpn_head(m.backbone(m._normalise(x)))))

    def to_props(m, x):
        feats = m.backbone(m._normalise(x))
        objness, deltas = m.rpn_head(feats)
        anchors, slices = m._anchors(), m._slices()
        out = []
        for i in range(T):
            pb, _, pv = select_proposals(
                anchors, objness[i], deltas[i], slices,
                (m.cfg.pad_height, m.cfg.pad_width),
                m.cfg.rpn_pre_nms_topk_test, m.cfg.rpn_post_nms_topk_test,
                m.cfg.rpn_nms_thresh, not m.cfg.fast_nms)
            out.append(pb)
        return scalar(out)

    timed("+proposals(RPN NMS)", to_props)

    def to_pool(m, x):
        feats = m.backbone(m._normalise(x))
        objness, deltas = m.rpn_head(feats)
        anchors, slices = m._anchors(), m._slices()
        acc = 0.0
        for i in range(T):
            pb, _, pv = select_proposals(
                anchors, objness[i], deltas[i], slices,
                (m.cfg.pad_height, m.cfg.pad_width),
                m.cfg.rpn_pre_nms_topk_test, m.cfg.rpn_post_nms_topk_test,
                m.cfg.rpn_nms_thresh, not m.cfg.fast_nms)
            acc = acc + jnp.sum(multilevel_roi_align_packed(
                [f[i] for f in feats[:4]], pb,
                m.cfg.box_pooler_resolution, STRIDES))
        return acc

    timed("+ROIAlign pooled7", to_pool)

    def up_to_boxhead(m, x):
        feats = m.backbone(m._normalise(x))
        objness, deltas = m.rpn_head(feats)
        anchors, slices = m._anchors(), m._slices()
        acc = 0.0
        for i in range(T):
            pb, _, pv = select_proposals(
                anchors, objness[i], deltas[i], slices,
                (m.cfg.pad_height, m.cfg.pad_width),
                m.cfg.rpn_pre_nms_topk_test, m.cfg.rpn_post_nms_topk_test,
                m.cfg.rpn_nms_thresh, not m.cfg.fast_nms)
            pooled = multilevel_roi_align_packed(
                [f[i] for f in feats[:4]], pb,
                m.cfg.box_pooler_resolution, STRIDES)
            cls_logits, box_deltas = m.box_head(pooled)
            acc = acc + jnp.sum(cls_logits) + jnp.sum(box_deltas)
        return acc

    timed("+box head", up_to_boxhead)

    # Dense heads alone on the folded final-detection batch.
    d = dcfg.detections_per_image
    pooled14 = [jnp.asarray(
        np.random.default_rng(9 + k).normal(size=(T * d, 14, 14, 256)),
        jnp.bfloat16) for k in (0, 1)]

    def timed_heads(name, method):
        fn = jax.jit(lambda p, pl: model.apply(p, pl, method=method))
        _ = float(fn(params, pooled14[0]))
        t0 = time.perf_counter()
        _ = float(fn(params, pooled14[1]))
        dt = time.perf_counter() - t0
        print(f"{name:>28}: {dt * 1e3:7.1f} ms  "
              f"(net {max(dt - rtt, 0) * 1e3:6.1f} ms)",
              file=sys.stderr, flush=True)

    def scalar1(x):
        return jnp.sum(x.astype(jnp.float32))

    timed_heads("mask head (400 rois)",
                lambda m, pl: scalar1(m.mask_head(pl)))
    if dcfg.voxel_on:
        timed_heads("voxel head (400 rois)",
                    lambda m, pl: scalar1(m.voxel_head(pl)))
    if dcfg.nocs_on:
        timed_heads("nocs head (400 rois)",
                    lambda m, pl: scalar1(m.nocs_head(pl)))


if __name__ == "__main__":
    main()
