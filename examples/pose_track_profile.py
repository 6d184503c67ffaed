"""Stage-level latency breakdown of the pose+graph+MPN half of the bench.

Companion to detector_profile.py, same tunnel-aware measurement pattern
(NOTES_ROUND2.md): each stage is one jit program reduced to a single scalar
fetched with float(); warmup on input A, timed on input B; the trivial-RTT
is subtracted.  Stages mirror bench.py's `pose_then_track`:

  pose_chunk      postprocess_frame vmapped over the 25 frames
  build_graph     identity matching + static edge template fill
  voxel_encoder   MPN appearance embedding on the (T*D, 32^3) voxels
  mpn_full        voxel encoder + message passing + edge classifier
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
from mot3d_tpu.geometry.backproject import make_intrinsics
from mot3d_tpu.models.mpn import TrackerModel
from mot3d_tpu.pose.pipeline import postprocess_frame
from mot3d_tpu.tracking import build_graph
from mot3d_tpu.tracking.graph_builder import make_template


def main():
    cfg = default_config()
    extraction = (sys.argv[1] if len(sys.argv) > 1 else "grid")
    cfg = cfg.replace(pose=dataclasses.replace(cfg.pose,
                                               extraction=extraction))
    tcfg, dcfg, cam = cfg.tracking, cfg.detection, cfg.camera
    T, D, M = tcfg.seq_len, dcfg.detections_per_image, dcfg.max_instances
    intrinsics = make_intrinsics(cam.fx, cam.fy, cam.cx, cam.cy)
    template = make_template(T, D, tcfg.max_frame_dist)
    trk_model = TrackerModel(cfg.graph)
    print("devices:", jax.devices(), "extraction:", extraction,
          file=sys.stderr)

    def inputs(seed):
        rng = np.random.default_rng(seed)
        return dict(
            boxes=jnp.asarray(rng.uniform(0, 200, (T, D, 4)), jnp.float32),
            scores=jnp.full((T, D), 0.9),
            classes=jnp.zeros((T, D), jnp.int32),
            valid=jnp.ones((T, D), bool),
            masks=jnp.asarray(rng.uniform(size=(T, D, 28, 28)), jnp.float32),
            voxels=jnp.asarray(rng.uniform(size=(T, D, 32, 32, 32)),
                               jnp.float32),
            nocs=jnp.asarray(rng.uniform(size=(T, D, 28, 28, 3)),
                             jnp.float32),
            gt_boxes2d=jnp.asarray(rng.uniform(0, 200, (T, M, 4)),
                                   jnp.float32),
            gt_valid2d=jnp.ones((T, M), bool),
            depth=jnp.asarray(rng.uniform(1, 4, (T, cam.height, cam.width)),
                              jnp.float32),
            campose=jnp.tile(jnp.eye(4), (T, 1, 1)),
            gt_boxes3d=jnp.asarray(rng.normal(size=(T, M, 8, 3)),
                                   jnp.float32),
        )

    REPS = 5
    ins = [inputs(i) for i in range(REPS + 1)]
    # Boxes must be well-formed (x1<x2, y1<y2).
    for d in ins:
        lo = jnp.minimum(d["boxes"][..., :2], d["boxes"][..., 2:])
        hi = jnp.maximum(d["boxes"][..., :2], d["boxes"][..., 2:]) + 8.0
        d["boxes"] = jnp.concatenate([lo, hi], -1)

    triv = jax.jit(lambda x: x.sum())
    _ = float(triv(ins[0]["depth"]))
    t0 = time.perf_counter()
    for i in range(1, REPS + 1):
        _ = float(triv(ins[i]["depth"]))
    rtt = (time.perf_counter() - t0) / REPS
    print(f"{'trivial RTT':>20}: {rtt * 1e3:7.1f} ms", file=sys.stderr,
          flush=True)

    pose_chunk = jax.vmap(
        lambda bx, sc, cl, va, ma, vo, no, g2, gv, de, cp, g3, k:
        postprocess_frame(bx, sc, cl, va, ma, vo, no, g2, gv, de, cp,
                          intrinsics, g3, k, cfg),
        in_axes=(0,) * 12 + (0,))

    def scalar(tree):
        return sum(jnp.sum(jnp.nan_to_num(x.astype(jnp.float32)))
                   for x in jax.tree_util.tree_leaves(tree)
                   if jnp.issubdtype(x.dtype, jnp.floating))

    def run_pose(d, key):
        keys = jax.random.split(key, T)
        return pose_chunk(d["boxes"], d["scores"], d["classes"], d["valid"],
                          d["masks"], d["voxels"], d["nocs"],
                          d["gt_boxes2d"], d["gt_valid2d"], d["depth"],
                          d["campose"], d["gt_boxes3d"], keys)

    def run_graph(d, frames):
        return build_graph(template, tcfg, frames.valid, frames.translations,
                           frames.rotations, frames.scales, frames.pred_boxes,
                           d["gt_boxes3d"], jnp.zeros((T, M), jnp.int32),
                           jnp.zeros((T, M), bool))

    e2 = len(template.src_frame) * 2
    trk_params = jax.jit(lambda k: trk_model.init(
        k, jnp.zeros((T * D, 32, 32, 32)), jnp.zeros(e2, jnp.int32),
        jnp.zeros(e2, jnp.int32), jnp.zeros((e2, 8)),
        jnp.zeros(e2, bool)))(jax.random.PRNGKey(1))

    def timed(name, fn):
        """Average over REPS distinct inputs (single-shot tunnel timings
        vary by +-20 ms; distinct inputs defeat the relay dedup)."""
        jfn = jax.jit(fn)
        _ = float(jfn(ins[0], jax.random.PRNGKey(0)))
        t0 = time.perf_counter()
        for i in range(1, REPS + 1):
            _ = float(jfn(ins[i], jax.random.PRNGKey(i)))
        dt = (time.perf_counter() - t0) / REPS
        print(f"{name:>20}: {dt * 1e3:7.1f} ms  "
              f"(net {max(dt - rtt, 0) * 1e3:6.1f} ms)",
              file=sys.stderr, flush=True)

    # --- sub-stages of the per-detection pose path (T*D = 400 dets) -----
    from mot3d_tpu.geometry.outlier import statistical_outlier_mask
    from mot3d_tpu.geometry.umeyama import estimate_similarity_transform
    from mot3d_tpu.pose.extraction import grid_extract

    g = int(round(cfg.pose.max_points ** 0.5))

    def extract_all(d, _k):
        def one(nc, ma, bx, de):
            return grid_extract(nc, ma, bx, de, intrinsics, grid=g)
        buf, bval = jax.vmap(jax.vmap(one, in_axes=(0, 0, 0, None)))(
            d["nocs"], d["masks"], d["boxes"], d["depth"])
        return buf, bval

    timed("  grid_extract(400)",
          lambda d, k: scalar(extract_all(d, k)[0]))

    def outliers_all(d, k):
        buf, bval = extract_all(d, k)
        p = cfg.pose
        def one(b, v):
            keep = statistical_outlier_mask(
                b[:, :3], v, p.outlier_nb_neighbors, p.outlier_std_ratio,
                p.outlier_min_points, candidates=p.outlier_candidates)
            return statistical_outlier_mask(
                b[:, 3:] - 0.5, keep, p.outlier_nb_neighbors,
                p.outlier_std_ratio, p.outlier_min_points,
                candidates=p.outlier_candidates)
        keep = jax.vmap(jax.vmap(one))(buf, bval)
        return buf, keep

    timed("  +outliers x2",
          lambda d, k: scalar(outliers_all(d, k)[1].astype(jnp.float32)))

    def ransac_all(d, k):
        buf, keep = outliers_all(d, k)
        p = cfg.pose
        keys = jax.random.split(k, T * D).reshape(T, D, -1)
        def one(b, v, kk):
            return estimate_similarity_transform(
                b[:, 3:] - 0.5, b[:, :3], v, kk, p.ransac_iters,
                p.ransac_sample_size, p.ratio_adapt, p.min_inlier_ratio,
                p.stop_divisor, p.solver)
        return jax.vmap(jax.vmap(one))(buf, keep, keys)

    timed("  +ransac(100 hyp)",
          lambda d, k: scalar(ransac_all(d, k)[:3]))

    timed("pose_chunk", lambda d, k: scalar(run_pose(d, k)))
    timed("+build_graph",
          lambda d, k: scalar(run_graph(d, run_pose(d, k))))

    from mot3d_tpu.models.mpn import VoxelEncoder
    enc_model = VoxelEncoder(cfg.graph.node_dim)
    enc_params = {"params": trk_params["params"]["voxel_encoder"]}
    enc = jax.jit(lambda p, v: jnp.sum(
        enc_model.apply(p, v).astype(jnp.float32)))
    vox2 = [d["voxels"].reshape(-1, 32, 32, 32) for d in ins]
    _ = float(enc(enc_params, vox2[0]))
    t0 = time.perf_counter()
    _ = float(enc(enc_params, vox2[1]))
    dt = time.perf_counter() - t0
    print(f"{'voxel_encoder':>20}: {dt * 1e3:7.1f} ms  "
          f"(net {max(dt - rtt, 0) * 1e3:6.1f} ms)",
          file=sys.stderr, flush=True)

    def full(d, k):
        frames = run_pose(d, k)
        g = run_graph(d, frames)
        logits = trk_model.apply(trk_params, frames.voxels.reshape(
            -1, 32, 32, 32), g.src, g.dst, g.edge_attr, g.edge_mask)
        return scalar(logits)

    timed("full pose+graph+mpn", full)


if __name__ == "__main__":
    main()
