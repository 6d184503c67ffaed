"""Isolated A/B of ROIAlign formulations at production shapes.

25 images x 500 post-NMS proposals, bf16 256-channel FPN over a 256x320
pad — the MaskRCNN.predict box-head pooling load.  Tunnel-aware timing
(NOTES_ROUND2.md): one scalar output fetched with float(), warmup on input
A, timed on input B, trivial RTT subtracted.
"""

import sys
import time

import numpy as np

from mot3d_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from mot3d_tpu.ops.roi_align import (multilevel_roi_align_mm,
                                     multilevel_roi_align_packed)

STRIDES = (4, 8, 16, 32)
B, N, C = 25, 500, 256
HW = (256, 320)


def main():
    rng = np.random.default_rng(0)
    feats = [[jnp.asarray(rng.normal(size=(B, HW[0] // s, HW[1] // s, C)),
                          jnp.bfloat16) for s in STRIDES] for _ in range(2)]
    boxes = []
    for _ in range(2):
        x0 = rng.uniform(0, 300, (B, N))
        y0 = rng.uniform(0, 240, (B, N))
        bw = rng.uniform(4, 220, (B, N))
        bh = rng.uniform(4, 220, (B, N))
        boxes.append(jnp.asarray(np.stack(
            [x0, y0, np.minimum(x0 + bw, HW[1]),
             np.minimum(y0 + bh, HW[0])], -1).astype(np.float32)))
    print("devices:", jax.devices(), file=sys.stderr)

    triv = jax.jit(lambda x: x.sum())
    _ = float(triv(boxes[0]))
    t0 = time.perf_counter()
    _ = float(triv(boxes[1]))
    rtt = time.perf_counter() - t0
    print(f"{'trivial RTT':>24}: {rtt * 1e3:7.1f} ms", file=sys.stderr,
          flush=True)

    def timed(name, per_image):
        def run(fs, bx):
            acc = 0.0
            for i in range(B):
                acc = acc + jnp.sum(per_image([f[i] for f in fs], bx[i])
                                    .astype(jnp.float32))
            return acc
        fn = jax.jit(run)
        _ = float(fn(feats[0], boxes[0]))
        t0 = time.perf_counter()
        _ = float(fn(feats[1], boxes[1]))
        dt = time.perf_counter() - t0
        print(f"{name:>24}: {dt * 1e3:7.1f} ms  "
              f"(net {max(dt - rtt, 0) * 1e3:6.1f} ms)",
              file=sys.stderr, flush=True)

    timed("mm (per-level+select)",
          lambda fs, bx: multilevel_roi_align_mm(fs, bx, 7, STRIDES))
    timed("packed pyramid",
          lambda fs, bx: multilevel_roi_align_packed(fs, bx, 7, STRIDES))


if __name__ == "__main__":
    main()
