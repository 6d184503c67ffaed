"""Detection-only trainer: the reference `Detection/train_net.py`
FrontTrainer (manual loop, periodic eval, periodic checkpoint, best-by-val
model) on the jit train step.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mot3d_tpu.config import Config
from mot3d_tpu.data.detection_loader import DetectionSample
from mot3d_tpu.models.mask_rcnn import GroundTruth, MaskRCNN
from mot3d_tpu.train.checkpoints import CheckpointManager
from mot3d_tpu.train.metrics_writer import MetricsWriter


def sample_to_gt(batch: DetectionSample) -> GroundTruth:
    return GroundTruth(
        boxes=jnp.asarray(batch.boxes), classes=jnp.asarray(batch.classes),
        valid=jnp.asarray(batch.valid), masks=jnp.asarray(batch.masks),
        voxels=jnp.asarray(batch.voxels), nocs=jnp.asarray(batch.nocs))


def _iter_samples(batch: DetectionSample):
    """Split a leading-axis-batched DetectionSample into per-frame samples."""
    for i in range(batch.image.shape[0]):
        yield DetectionSample(*(np.asarray(f)[i] for f in batch))


class DetectionTrainState(NamedTuple):
    params: object
    opt_state: object
    step: jax.Array


class DetectionTrainer:
    def __init__(self, cfg: Config, output_dir: str = "out/detection"):
        self.cfg = cfg
        self.output_dir = output_dir
        self.model = MaskRCNN(cfg.detection)
        from mot3d_tpu.train.schedules import warmup_multistep
        self.optimizer = optax.adamw(
            warmup_multistep(cfg.combined.detection_lr,
                             cfg.combined.lr_warmup_iters,
                             cfg.combined.lr_warmup_factor,
                             cfg.combined.lr_steps,
                             cfg.combined.lr_gamma),
            weight_decay=cfg.combined.detection_weight_decay)
        self.writer = MetricsWriter(output_dir, cfg.run.log_every)
        self.ckpt = CheckpointManager(os.path.join(output_dir, "ckpt"))
        self.state: Optional[DetectionTrainState] = None
        self._step_fn = None
        self._loss_fn = None

    def init_state(self, batch: DetectionSample,
                   params=None) -> DetectionTrainState:
        """`params`: optional pretrained variables (e.g. an
        import_detectron2_maskrcnn partial import) — the reference trains
        from COCO model-zoo weights, not from scratch
        (`Detection/cfg_setup.py:21`)."""
        if params is None:
            images = jnp.asarray(batch.image)
            gt = sample_to_gt(batch)
            params = jax.jit(lambda k1, k2: self.model.init(
                {"params": k1}, images, gt, k2,
                method=MaskRCNN.train_losses))(
                    jax.random.PRNGKey(self.cfg.run.seed),
                    jax.random.PRNGKey(self.cfg.run.seed + 1))
        self.state = DetectionTrainState(params, self.optimizer.init(params),
                                         jnp.zeros((), jnp.int32))
        return self.state

    def _make_step(self):
        model, opt = self.model, self.optimizer

        def step(state: DetectionTrainState, images, gt: GroundTruth, rng):
            # Batches arrive compact (uint8/bool, see compact_sample);
            # widen to f32 on device — the cast is free next to the H2D
            # bytes it saves over the tunnel.
            images = images.astype(jnp.float32)
            gt = gt._replace(masks=gt.masks.astype(jnp.float32),
                             voxels=gt.voxels.astype(jnp.float32))

            def loss_fn(p):
                losses = model.apply(p, images, gt, rng,
                                     method=MaskRCNN.train_losses)
                total = sum(v for k, v in losses.items()
                            if k.startswith("loss"))
                return total, losses

            (total, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = opt.update(grads, state.opt_state,
                                            state.params)
            params = optax.apply_updates(state.params, updates)
            losses["total"] = total
            return DetectionTrainState(params, opt_state,
                                       state.step + 1), losses

        return jax.jit(step)

    # ------------------------------------------------------------------
    def train(self, batches: Iterator[DetectionSample],
              val_batches=None, max_iter: Optional[int] = None,
              full_eval: bool = True, resume: bool = False,
              init_params=None) -> Dict[str, float]:
        """`full_eval` adds the voxnocs + COCO-AP evaluators to the periodic
        eval, as the reference's do_test does (`train_net.py:66-90`).
        `resume` reloads the latest full train state (params + optimizer +
        step, so the LR schedule continues too) from this trainer's ckpt
        dir — the reference's resume_or_load(resume=True)
        (`Detection/train_net.py:99-110`)."""
        cfg = self.cfg.combined
        max_iter = max_iter or cfg.max_iter
        rng = jax.random.PRNGKey(self.cfg.run.seed + 2)
        metrics: Dict[str, float] = {}
        # Device-side prefetch: the H2D copy of batch N+1 overlaps the
        # compute of batch N (data/prefetch.py).  Batches travel compact
        # (uint8 images, bool masks/voxels: ~4x fewer bytes over the
        # tunnel) and are widened on device inside the jit step.
        from mot3d_tpu.data.detection_loader import compact_sample
        from mot3d_tpu.data.prefetch import device_prefetch
        step = None  # host-side mirror of state.step: a per-iteration
        # int(self.state.step) would block on the step's completion and
        # pay a device round trip, serialising the dispatch pipeline.
        for batch in device_prefetch(map(compact_sample, batches)):
            if self.state is None:
                self.init_state(batch, params=init_params)
                if resume:
                    from mot3d_tpu.train.checkpoints import resume_trainer
                    resume_trainer(self)
            if step is None:
                step = int(self.state.step)
            if step >= max_iter:
                break
            if self._step_fn is None:
                self._step_fn = self._make_step()
            rng, sub = jax.random.split(rng)
            self.state, metrics = self._step_fn(
                self.state, jnp.asarray(batch.image), sample_to_gt(batch),
                sub)
            step += 1
            self.writer.write(step, metrics)
            if val_batches is not None and step % cfg.eval_period == 0:
                val = self.evaluate(val_batches, voxnocs=full_eval,
                                    ap=full_eval)
                self.writer.write(step, val, split="val", echo=True)
                if full_eval:
                    # Voxel/NOCS image renders (FrontEvaluator put_image)
                    # + per-class AP / pose-error charts (save_ap).
                    self.write_image_summaries(next(iter(val_batches)), step)
                    self.write_chart_summaries(val, step)
                self.ckpt.update_best("val_loss", val["val_total"], step,
                                      self.state, higher_is_better=False)
            if step % cfg.checkpoint_period == 0:
                self.ckpt.save(step, self.state)
        self.writer.flush()
        return {k: float(v) for k, v in metrics.items()}

    # ------------------------------------------------------------------
    def evaluate(self, batches, voxnocs: bool = False,
                 ap: bool = False) -> Dict[str, float]:
        """Validation losses (the reference's val-loss eval,
        `EvaluatorUtils.py:234-249` _get_loss); with `voxnocs`/`ap` also the
        FrontEvaluator voxel-IoU + pose-error metrics
        (`FrontEvaluator.py:243-550`) and COCO bbox+segm AP
        (`EvaluatorUtils.py:358-415`) — the reference runs all three every
        EVAL_PERIOD (`Detection/train_net.py:66-90` do_test)."""
        out = self._evaluate_losses(batches)
        if voxnocs or ap:
            # ONE batched prediction pass shared by the voxnocs and AP
            # evaluators (the reference runs separate evaluator loops;
            # predicting once here removes two full detector sweeps).
            shared = [(batch, self.predict(batch.image))
                      for batch in batches]
            if voxnocs:
                out.update(self.evaluate_voxnocs(batches, shared=shared))
            if ap:
                out.update(self.evaluate_ap(batches, segm=True,
                                            shared=shared))
        return out

    def _evaluate_losses(self, batches) -> Dict[str, float]:
        if self._loss_fn is None:
            self._loss_fn = jax.jit(lambda p, im, gt, r: self.model.apply(
                p, im, gt, r, method=MaskRCNN.train_losses))
        rng = jax.random.PRNGKey(0)
        acc: Dict[str, list] = {}
        for batch in batches:
            rng, sub = jax.random.split(rng)
            losses = self._loss_fn(self.state.params,
                                   jnp.asarray(batch.image),
                                   sample_to_gt(batch), sub)
            for k, v in losses.items():
                acc.setdefault(k, []).append(float(v))
        out = {f"val_{k}": float(np.mean(v)) for k, v in acc.items()}
        out["val_total"] = sum(v for k, v in out.items()
                               if k.startswith("val_loss"))
        return out

    def predict(self, images):
        if not hasattr(self, "_predict"):
            self._predict = jax.jit(lambda p, im: self.model.apply(
                p, im, method=MaskRCNN.predict))
        return self._predict(self.state.params, jnp.asarray(images))

    def evaluate_ap(self, batches, segm: bool = False,
                    shared=None) -> Dict[str, float]:
        """COCO-protocol bbox (and optionally segm) AP over a validation
        split (the reference's inference_on_dataset_coco + save_ap,
        `EvaluatorUtils.py:358-415`; the vendored COCOEvaluator reports both
        tasks, `Detection/evaluator/CocoEvaluator.py:32`).  `shared`:
        optional precomputed [(batch, dets)] prediction pass."""
        from mot3d_tpu.evaluator.coco_eval import COCOEvaluator
        ev = COCOEvaluator(self.cfg.detection.num_classes)
        for batch, dets in (shared if shared is not None
                            else ((b, self.predict(b.image))
                                  for b in batches)):
            dt_masks = (np.asarray(self._paste_masks(dets.masks, dets.boxes))
                        if segm else None)
            for i in range(batch.image.shape[0]):
                ev.add_image(
                    np.asarray(dets.boxes[i]), np.asarray(dets.scores[i]),
                    np.asarray(dets.classes[i]), np.asarray(dets.valid[i]),
                    batch.boxes[i], batch.classes[i], batch.valid[i],
                    dt_masks=dt_masks[i] if segm else None,
                    gt_masks=batch.masks[i] if segm else None)
        return ev.summarize()

    def _paste_masks(self, masks28, boxes):
        """Paste (B, D, 28, 28) ROI mask probs into full-image binary masks
        (detectron2 paste_masks_in_image equivalent; separable resize)."""
        if not hasattr(self, "_paste_fn"):
            from mot3d_tpu.pose.pipeline import paste_patch
            hw = (self.cfg.detection.pad_height, self.cfg.detection.pad_width)

            def paste_one(m, b):
                return paste_patch(m[..., None], b, hw)[..., 0] >= 0.5

            self._paste_fn = jax.jit(jax.vmap(jax.vmap(paste_one)))
        return self._paste_fn(masks28, boxes)

    def write_image_summaries(self, batch: DetectionSample, step: int,
                              max_instances: int = 3) -> list:
        """Voxel renders + NOCS patch panels for a few GT instances
        (the reference's tensorboard put_image calls during eval,
        `Detection/evaluator/FrontEvaluator.py:293-333` voxel plots and
        `:442-452` NOCS patches).  Heads run on GT boxes
        (predict_given_boxes) so pred/GT pairs align.  Returns the PNG
        paths written."""
        from mot3d_tpu.models.mask_rcnn import MaskRCNN
        from mot3d_tpu.train.image_summaries import (ImageWriter,
                                                     render_nocs_panel,
                                                     render_voxel_views)
        if not hasattr(self, "_img_writer"):
            self._img_writer = ImageWriter(self.output_dir)
        if not hasattr(self, "_given_boxes_fn"):
            self._given_boxes_fn = jax.jit(
                lambda p, im, bx, cl: self.model.apply(
                    p, im, bx, cl, method=MaskRCNN.predict_given_boxes))
        _, pred_voxels, pred_nocs = self._given_boxes_fn(
            self.state.params, jnp.asarray(batch.image)[:1],
            jnp.asarray(batch.boxes)[:1], jnp.asarray(batch.classes)[:1])
        paths = []
        written = 0
        for i in range(batch.valid.shape[1]):
            if written >= max_instances or not batch.valid[0, i]:
                continue
            vox_img = render_voxel_views(
                np.asarray(pred_voxels[0, i]) >= 0.5,
                batch.voxels[0, i] >= 0.5)
            paths.append(self._img_writer.write_image(
                step, f"voxels/inst{i}", vox_img))
            nocs_img = render_nocs_panel(np.asarray(pred_nocs[0, i]),
                                         batch.nocs[0, i])
            paths.append(self._img_writer.write_image(
                step, f"nocs/inst{i}", nocs_img))
            written += 1
        return paths

    def write_chart_summaries(self, metrics: Dict[str, float],
                              step: int) -> list:
        """Per-class bar charts from the eval metric dict: bbox/segm AP per
        class (`EvaluatorUtils.py:358-415` save_ap) and voxel-IoU /
        rotation / location medians per class (FrontEvaluator renders)."""
        from mot3d_tpu.config import MOTFRONT_CLASSES
        from mot3d_tpu.train.image_summaries import (ImageWriter,
                                                     render_class_bars)
        if not hasattr(self, "_img_writer"):
            self._img_writer = ImageWriter(self.output_dir)
        charts = []
        for task in ("bbox", "segm"):
            # Keys look like "bbox/AP/class_<i>" (coco_eval.compute_ap).
            per_class = {
                MOTFRONT_CLASSES[int(k.rsplit("class_", 1)[1])]: v
                for k, v in metrics.items()
                if k.startswith(f"{task}/AP/class_")}
            if per_class:
                charts.append((f"ap/{task}", per_class,
                               f"{task} AP per class", "AP"))
        for metric, ylabel in (("voxel_iou", "IoU"),
                               ("rot_err_median", "deg"),
                               ("loc_err_median", "m")):
            per_class = {k.split("/")[0]: v for k, v in metrics.items()
                         if k.endswith("/" + metric)}
            if per_class:
                charts.append((f"pose/{metric}", per_class, metric, ylabel))
        paths = [self._img_writer.write_image(
            step, tag, render_class_bars(vals, title, ylabel))
            for tag, vals, title, ylabel in charts]

        # Per-instance error histograms from the last voxnocs eval
        # (FrontEvaluator's error-distribution renders).
        raw = getattr(getattr(self, "_exporter", None),
                      "last_raw_metrics", None)
        if raw:
            from mot3d_tpu.train.image_summaries import render_histogram
            for metric, xlabel in (("rot_err", "deg"), ("loc_err", "m")):
                pooled = [v for per_cls in raw.values()
                          for v in per_cls.get(metric, [])]
                if pooled:
                    paths.append(self._img_writer.write_image(
                        step, f"hist/{metric}",
                        render_histogram(pooled, f"{metric} per instance",
                                         xlabel)))
        return paths

    def evaluate_voxnocs(self, batches, shared=None) -> Dict[str, float]:
        """FrontEvaluator-equivalent voxel/NOCS eval during training:
        per-class mean voxel IoU + median pose rotation/location errors
        (`Detection/evaluator/FrontEvaluator.py:243-550` _evaluate_voxel /
        _evaluate_nocs with run_pose, via `EvaluatorUtils.py:18-130`).
        `shared`: optional precomputed [(batch, dets)] prediction pass —
        per-frame slices are handed to the exporter instead of re-running
        the detector sample by sample."""
        from mot3d_tpu.export import DetectorExporter
        if not hasattr(self, "_exporter"):
            self._exporter = DetectorExporter(self.cfg, self.model,
                                              self.state.params)
        self._exporter.params = self.state.params
        if shared is None:
            samples = (s for batch in batches for s in _iter_samples(batch))
            return self._exporter.evaluate_samples(samples)
        samples, dets_list = [], []
        for batch, dets in shared:
            for i, s in enumerate(_iter_samples(batch)):
                samples.append(s)
                dets_list.append(jax.tree_util.tree_map(
                    lambda x, i=i: x[i:i + 1], dets))
        return self._exporter.evaluate_samples(samples,
                                               dets_list=dets_list)
