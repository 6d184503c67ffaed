"""Oracle drive for the pose-extraction default (VERDICT r2 weak #6).

Runs `postprocess_frame` on the REAL TPU twice — extraction="grid" (the
round-2 default) vs "pallas" (the fused VMEM-resident kernel,
ops/pallas/pose_extract.py) — on (a) structured synthetic detections with a
planted similarity transform and (b) random garbage detections, and prints
elementwise max diffs of every output plus per-frame latency.  CPU tests
already pin the two bit-identical (tests/test_pose_extract_pallas.py); this
drives the same claim on the actual hardware + records the speed, which is
what flipping the default was gated on (NOTES_ROUND2.md:177-179).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python examples/extraction_oracle_drive.py
"""

import dataclasses
import sys
import time

import numpy as np

from mot3d_tpu.runtime import enable_compilation_cache, require_backend

enable_compilation_cache()

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    log("devices:", require_backend(300.0))
    from mot3d_tpu.config import default_config
    from mot3d_tpu.geometry.backproject import make_intrinsics
    from mot3d_tpu.pose.pipeline import postprocess_frame

    base = default_config()
    cam = base.camera
    K = make_intrinsics(cam.fx, cam.fy, cam.cx, cam.cy)
    H, W = cam.height, cam.width
    I = base.detection.detections_per_image
    rng = np.random.default_rng(0)

    # (a) structured: one planted box with a consistent NOCS ramp + plane
    # depth; (b) garbage: random everything.  Both padded to I slots.
    def inputs(structured: bool, seed: int):
        r = np.random.default_rng(seed)
        boxes = np.zeros((I, 4), np.float32)
        masks = r.uniform(0.6, 1.0, (I, 28, 28)).astype(np.float32)
        nocs = r.uniform(size=(I, 28, 28, 3)).astype(np.float32)
        depth = r.uniform(1.5, 3.0, (H, W)).astype(np.float32)
        for i in range(I):
            x0 = r.integers(0, W - 80)
            y0 = r.integers(0, H - 80)
            boxes[i] = [x0, y0, x0 + 70, y0 + 70]
        if structured:
            ramp = np.linspace(0.2, 0.8, 28, dtype=np.float32)
            nocs[:] = np.stack(
                [np.tile(ramp, (28, 1)), np.tile(ramp[:, None], (1, 28)),
                 np.full((28, 28), 0.5, np.float32)], -1)[None]
            yy, xx = np.mgrid[:H, :W]
            depth = (2.0 + 0.3 * xx / W + 0.2 * yy / H).astype(np.float32)
        valid = np.ones(I, bool)
        scores = np.full(I, 0.9, np.float32)
        classes = np.zeros(I, np.int32)
        voxels = (r.uniform(size=(I, 32, 32, 32)) < 0.3).astype(np.float32)
        g2 = boxes.copy()
        g3 = r.normal(size=(I, 8, 3)).astype(np.float32) * 2
        return (jnp.asarray(boxes), jnp.asarray(scores),
                jnp.asarray(classes), jnp.asarray(valid), jnp.asarray(masks),
                jnp.asarray(voxels), jnp.asarray(nocs), jnp.asarray(g2),
                jnp.ones(I, bool), jnp.asarray(depth),
                jnp.eye(4), jnp.asarray(g3))

    for mode_name, structured in (("structured", True), ("garbage", False)):
        outs = {}
        times = {}
        for extraction in ("grid", "pallas"):
            cfg = base.replace(pose=dataclasses.replace(
                base.pose, extraction=extraction))
            fn = jax.jit(lambda bx, sc, cl, va, ma, vo, no, g2, gv, de, cp,
                         g3, k, cfg=cfg:
                         postprocess_frame(bx, sc, cl, va, ma, vo, no, g2,
                                           gv, de, cp, K, g3, k, cfg))
            args = inputs(structured, 7)
            key = jax.random.PRNGKey(1)
            out = jax.device_get(fn(*args, key))
            # latency: alternate two inputs, scalar fetch
            args2 = inputs(structured, 8)
            s_fn = jax.jit(lambda *a, cfg=cfg: jnp.sum(
                postprocess_frame(*a[:11], K, a[11], a[12], cfg)
                .translations))
            _ = float(s_fn(*args, key))
            _ = float(s_fn(*args2, key))
            best = np.inf
            for rrep in range(5):
                t0 = time.perf_counter()
                _ = float(s_fn(*(args if rrep % 2 == 0 else args2), key))
                best = min(best, time.perf_counter() - t0)
            outs[extraction] = out
            times[extraction] = best
        log(f"--- {mode_name} ---")
        for f in outs["grid"]._fields:
            a = np.asarray(getattr(outs["grid"], f), np.float32)
            b = np.asarray(getattr(outs["pallas"], f), np.float32)
            log(f"  {f:>14}: max|diff| = {np.abs(a - b).max():.3e}")
        log(f"  latency/frame: grid {times['grid'] * 1e3:.1f} ms, "
            f"pallas {times['pallas'] * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
