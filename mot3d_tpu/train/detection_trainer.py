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


class DetectionTrainState(NamedTuple):
    params: object
    opt_state: object
    step: jax.Array


class DetectionTrainer:
    def __init__(self, cfg: Config, output_dir: str = "out/detection"):
        self.cfg = cfg
        self.model = MaskRCNN(cfg.detection)
        self.optimizer = optax.adamw(
            cfg.combined.detection_lr,
            weight_decay=cfg.combined.detection_weight_decay)
        self.writer = MetricsWriter(output_dir, cfg.run.log_every)
        self.ckpt = CheckpointManager(os.path.join(output_dir, "ckpt"))
        self.state: Optional[DetectionTrainState] = None
        self._step_fn = None
        self._loss_fn = None

    def init_state(self, batch: DetectionSample) -> DetectionTrainState:
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
              val_batches=None, max_iter: Optional[int] = None
              ) -> Dict[str, float]:
        cfg = self.cfg.combined
        max_iter = max_iter or cfg.max_iter
        rng = jax.random.PRNGKey(self.cfg.run.seed + 2)
        metrics: Dict[str, float] = {}
        for i, batch in enumerate(batches):
            if i >= max_iter:
                break
            if self.state is None:
                self.init_state(batch)
            if self._step_fn is None:
                self._step_fn = self._make_step()
            rng, sub = jax.random.split(rng)
            self.state, metrics = self._step_fn(
                self.state, jnp.asarray(batch.image), sample_to_gt(batch),
                sub)
            step = int(self.state.step)
            self.writer.write(step, metrics)
            if val_batches is not None and step % cfg.eval_period == 0:
                val = self.evaluate(val_batches)
                self.writer.write(step, val, split="val", echo=True)
                self.ckpt.update_best("val_loss", val["val_total"], step,
                                      self.state, higher_is_better=False)
            if step % cfg.checkpoint_period == 0:
                self.ckpt.save(step, self.state)
        return {k: float(v) for k, v in metrics.items()}

    # ------------------------------------------------------------------
    def evaluate(self, batches) -> Dict[str, float]:
        """Validation losses (the reference's val-loss eval,
        `EvaluatorUtils.py:234-249` _get_loss)."""
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

    def evaluate_ap(self, batches) -> Dict[str, float]:
        """COCO-protocol bbox AP over a validation split (the reference's
        inference_on_dataset_coco + save_ap, `EvaluatorUtils.py:358-415`)."""
        from mot3d_tpu.evaluator.coco_eval import COCOEvaluator
        ev = COCOEvaluator(self.cfg.detection.num_classes)
        for batch in batches:
            dets = self.predict(batch.image)
            for i in range(batch.image.shape[0]):
                ev.add_image(
                    np.asarray(dets.boxes[i]), np.asarray(dets.scores[i]),
                    np.asarray(dets.classes[i]), np.asarray(dets.valid[i]),
                    batch.boxes[i], batch.classes[i], batch.valid[i])
        return ev.summarize()
