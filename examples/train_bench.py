"""Training-step benchmark at reference shapes (VERDICT r2 weak #4).

Measures, on the real TPU:
  - detection train step (bs=2, full MOTFront 256x320): ms/step, steps/s,
    and train MFU from XLA's own cost_analysis of the jitted step;
  - combined end-to-end step (bs=2 windows of T=2 frames,
    `Detection/train_combined.py:481-569` protocol): ms/step for BOTH
    gradient structures — the reference's two-backward form and the joint
    single-backward form (parallel/train_step.py joint_grad).

Reference protocol: 240k iterations at these shapes (cfg_setup.py:108-118),
so ms/step is the number that matters for end-to-end training cost.

Pattern for the tunnelled TPU (NOTES_ROUND2.md): every timed program
returns ONE scalar fetched with float() — a real data dependency; repeated
identical dispatches are deduped by the relay, so timed calls alternate
between two input batches.

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/train_bench.py
Env: TB_DTYPE (default bfloat16), TB_REPS (default 5).
"""

import dataclasses
import os
import sys
import time

import numpy as np

from mot3d_tpu.runtime import enable_compilation_cache, require_backend

enable_compilation_cache()

import jax
import jax.numpy as jnp
import optax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chip_peak(dtype):
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    peaks = {"v5e": 197e12, "v5p": 459e12, "v4": 275e12, "v6e": 918e12}
    p = peaks.get(gen, 197e12)
    return p if dtype == "bfloat16" else p / 2


def timed_step(name, fn, args_a, args_b, reps):
    t0 = time.perf_counter()
    _ = float(fn(*args_a))
    compile_s = time.perf_counter() - t0
    _ = float(fn(*args_b))
    best = np.inf
    for r in range(reps):
        t0 = time.perf_counter()
        _ = float(fn(*(args_a if r % 2 == 0 else args_b)))
        best = min(best, time.perf_counter() - t0)
    log(f"{name:>34}: compile {compile_s:6.1f}s  steady {best * 1e3:7.1f} "
        f"ms/step  ({1.0 / best:5.2f} steps/s)")
    return compile_s, best


def main():
    dtype = os.environ.get("TB_DTYPE", "bfloat16")
    reps = int(os.environ.get("TB_REPS", "5"))
    log("devices:", require_backend(300.0))

    from mot3d_tpu.config import default_config
    from mot3d_tpu.data.synthetic_detection import synthetic_detection_scene
    from mot3d_tpu.models.mask_rcnn import GroundTruth, MaskRCNN
    from mot3d_tpu.models.mpn import TrackerModel
    from mot3d_tpu.parallel.train_step import (CombinedBatch,
                                               CombinedTrainState,
                                               make_combined_train_step)
    from mot3d_tpu.tracking.graph_builder import make_template

    cfg = default_config()
    cfg = cfg.replace(
        detection=dataclasses.replace(cfg.detection, compute_dtype=dtype),
        tracking=dataclasses.replace(cfg.tracking, seq_len=2))
    dcfg = cfg.detection

    # ---------------- detection-only step (bs=2) ---------------------------
    det_model = MaskRCNN(dcfg)
    scenes = [synthetic_detection_scene(dcfg, batch=2, num_objects=4, seed=s)
              for s in (0, 1)]

    def to_gt(sc):
        return GroundTruth(boxes=jnp.asarray(sc.boxes),
                           classes=jnp.asarray(sc.classes),
                           valid=jnp.asarray(sc.valid),
                           masks=jnp.asarray(sc.masks),
                           voxels=jnp.asarray(sc.voxels),
                           nocs=jnp.asarray(sc.nocs))

    images = [jnp.asarray(sc.images) for sc in scenes]
    gts = [to_gt(sc) for sc in scenes]
    det_params = jax.jit(lambda k1, k2: det_model.init(
        {"params": k1}, images[0], gts[0], k2,
        method=MaskRCNN.train_losses))(jax.random.PRNGKey(0),
                                       jax.random.PRNGKey(1))
    opt = optax.adamw(8e-4, weight_decay=5e-4)
    opt_state = opt.init(det_params)

    def det_step(params, opt_state, images, gt, rng):
        def loss_fn(p):
            losses = det_model.apply(p, images, gt, rng,
                                     method=MaskRCNN.train_losses)
            return sum(v for k, v in losses.items() if k.startswith("loss"))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # Scalar data dependency through EVERY leaf of the updated params:
        # depending on one leaf only lets XLA dead-code-eliminate the
        # dW = cotangent x activation products of every other layer (their
        # updates are unused), which under-counted the step at 1.25 TFLOP
        # vs the true 1.87 and inverted the fwd/bwd split (VERDICT r4
        # weak #5).
        return loss + jax.tree_util.tree_reduce(
            lambda a, x: a + x.ravel()[0].astype(jnp.float32), params, 0.0
        ) * 0

    det_jit = jax.jit(det_step)
    a = (det_params, opt_state, images[0], gts[0], jax.random.PRNGKey(2))
    b = (det_params, opt_state, images[1], gts[1], jax.random.PRNGKey(3))
    _, det_ms = timed_step("detection step (bs=2)", det_jit, a, b, reps)

    # Stage split: forward-only vs forward+backward vs the full step —
    # the train-path profile the inference path got in round 2.
    def det_fwd(params, images, gt, rng):
        losses = det_model.apply(params, images, gt, rng,
                                 method=MaskRCNN.train_losses)
        return sum(v for k, v in losses.items() if k.startswith("loss"))

    def det_fwd_bwd(params, images, gt, rng):
        loss, grads = jax.value_and_grad(det_fwd)(params, images, gt, rng)
        # Depend on every grad leaf — see det_step's DCE note.
        return loss + jax.tree_util.tree_reduce(
            lambda a, x: a + x.ravel()[0].astype(jnp.float32), grads, 0.0
        ) * 0

    _, fwd_ms = timed_step("  det forward only (bs=2)", jax.jit(det_fwd),
                           a[:1] + a[2:], b[:1] + b[2:], reps)
    _, fb_ms = timed_step("  det forward+backward (bs=2)",
                          jax.jit(det_fwd_bwd), a[:1] + a[2:],
                          b[:1] + b[2:], reps)
    log(f"{'':>34}  stage split: fwd {fwd_ms * 1e3:.0f} ms, bwd "
        f"{(fb_ms - fwd_ms) * 1e3:.0f} ms, optimizer+update "
        f"{(det_ms - fb_ms) * 1e3:.0f} ms")

    # Batch scaling: samples/s per chip at growing bs (the reference runs
    # bs=2 per GPU; a chip with memory headroom can amortise fixed costs).
    for bs in (4, 8):
        try:
            sc2 = [synthetic_detection_scene(dcfg, batch=bs, num_objects=4,
                                             seed=s) for s in (2, 3)]
            aa = (det_params, opt_state, jnp.asarray(sc2[0].images),
                  to_gt(sc2[0]), jax.random.PRNGKey(4))
            bb = (det_params, opt_state, jnp.asarray(sc2[1].images),
                  to_gt(sc2[1]), jax.random.PRNGKey(5))
            _, ms = timed_step(f"detection step (bs={bs})", det_jit, aa, bb,
                               reps)
            log(f"{'':>34}  -> {bs / ms:.1f} img/s (vs {2 / det_ms:.1f} "
                f"at bs=2)")
        except Exception as e:
            log(f"detection step (bs={bs}) FAILED: {type(e).__name__}: "
                f"{str(e)[:300]}")

    try:
        cost = jax.jit(det_step).lower(*a).compile().cost_analysis()
        flops = float(cost.get("flops", 0.0))
        peak = chip_peak(dtype)
        log(f"{'':>34}  {flops / 1e12:.2f} TFLOP/step -> train MFU "
            f"{100 * flops / det_ms / peak:.1f}% of {peak / 1e12:.0f} "
            f"TFLOP/s ({dtype})")
    except Exception as e:
        log("cost_analysis unavailable:", e)

    # ---------------- combined step (bs=2, T=2) ----------------------------
    T, B = 2, int(os.environ.get("TB_COMBINED_B", "2"))
    M = dcfg.max_instances
    H, W = dcfg.pad_height, dcfg.pad_width
    trk_model = TrackerModel(cfg.graph)
    template = make_template(T, dcfg.detections_per_image,
                             cfg.tracking.max_frame_dist)
    rng = np.random.default_rng(0)

    def make_batch(seed):
        r = np.random.default_rng(seed)
        sc = synthetic_detection_scene(dcfg, batch=B * T, num_objects=4,
                                       seed=seed)
        shp = lambda x: jnp.asarray(x).reshape((B, T) + x.shape[1:])
        return CombinedBatch(
            images=shp(sc.images), depth=jnp.asarray(
                r.uniform(1, 4, (B, T, H, W)), jnp.float32),
            campose=jnp.tile(jnp.eye(4), (B, T, 1, 1)),
            gt_boxes2d=shp(sc.boxes), gt_classes=shp(sc.classes),
            gt_valid=shp(sc.valid), gt_masks=shp(sc.masks),
            gt_voxels=shp(sc.voxels), gt_nocs=shp(sc.nocs),
            gt_boxes3d=jnp.asarray(r.normal(size=(B, T, M, 8, 3)),
                                   jnp.float32),
            gt_ids=jnp.tile(jnp.arange(M, dtype=jnp.int32), (B, T, 1)))

    batches = [make_batch(s) for s in (10, 11)]
    n_nodes = T * dcfg.detections_per_image
    e2 = len(template.src_frame) * 2
    trk_params = jax.jit(lambda k: trk_model.init(
        k, jnp.zeros((n_nodes, 32, 32, 32)), jnp.zeros(e2, jnp.int32),
        jnp.zeros(e2, jnp.int32), jnp.zeros((e2, 8)),
        jnp.zeros(e2, bool)))(jax.random.PRNGKey(4))
    det_opt = optax.adamw(8e-4, weight_decay=5e-4)
    trk_opt = optax.adamw(1e-3, weight_decay=1e-4)
    state = CombinedTrainState(
        det_params=det_params, det_opt_state=det_opt.init(det_params),
        trk_params=trk_params, trk_opt_state=trk_opt.init(trk_params),
        step=jnp.zeros((), jnp.int32))

    accum = os.environ.get("TB_ACCUM", "0") == "1"
    results = {}
    for joint in ((True,) if accum else (False, True)):
        step = make_combined_train_step(det_model, trk_model, template, cfg,
                                        det_opt, trk_opt, joint_grad=joint,
                                        accum_windows=accum)

        def run(state, batch, rng):
            new_state, metrics = step(state, batch, rng)
            return (metrics["detection_total"] + metrics["tracking_loss"]
                    + new_state.step.astype(jnp.float32))

        name = "joint 1-backward" if joint else "reference 2-backward"
        try:
            _, ms = timed_step(f"combined step (bs={B},T=2{", accum" if accum else ""}) {name}",
                               jax.jit(run),
                               (state, batches[0], jax.random.PRNGKey(5)),
                               (state, batches[1], jax.random.PRNGKey(6)),
                               reps)
            results[name] = ms
        except Exception as e:
            log(f"combined step ({name}) FAILED: {type(e).__name__}: "
                f"{str(e)[:2000]}")
    if len(results) == 2:
        log(f"combined step: joint/two-backward ratio = "
            f"{results['joint 1-backward'] / results['reference 2-backward']:.3f}")


if __name__ == "__main__":
    main()
