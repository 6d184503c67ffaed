"""End-to-end trainer: detect -> reconstruct -> pose -> track in one program.

The reference flagship `Detection/train_combined.py`:
  - do_train (:435-569): per iteration, detection losses + a second full
    eval forward, host pose fitting, graph build, tracking BCE, two
    independent optimizer steps;
  - do_test (:128-433): stream the test split, per sequence run
    postprocess -> tracker -> trajectories -> motmetrics MOTA (accumulated +
    classwise), keep the best model by accumulated MOTA (check_save_models,
    :94-124).

Here do_train is ONE jit-compiled sharded step (parallel/train_step.py) and
do_test runs the jitted inference pieces per sequence with host-side
trajectory/MOTA bookkeeping.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mot3d_tpu.config import Config
from mot3d_tpu.data.detection_loader import DetectionSample
from mot3d_tpu.geometry.backproject import make_intrinsics
from mot3d_tpu.models.mask_rcnn import MaskRCNN
from mot3d_tpu.models.mpn import TrackerModel
from mot3d_tpu.parallel.train_step import (CombinedBatch, CombinedTrainState,
                                           make_combined_train_step)
from mot3d_tpu.pose.pipeline import postprocess_frame
from mot3d_tpu.tracking import Tracker, build_graph
from mot3d_tpu.tracking.graph_builder import make_template
from mot3d_tpu.tracking.mot_metrics import (accumulated_idf1,
                                             accumulated_mota)
from mot3d_tpu.train.checkpoints import CheckpointManager
from mot3d_tpu.train.metrics_writer import MetricsWriter


def samples_to_combined_window(frames: List[DetectionSample]) -> CombinedBatch:
    """Stack T per-frame DetectionSamples into one window (no batch dim).

    The heavy fields travel compact (uint8 image, bool masks/voxels — all
    exactly-representable values), ~4x fewer H2D bytes over the tunnel;
    the jit step widens on device (train_step.widen) and the model's
    pixel-mean normalisation promotes uint8 images itself."""
    f = lambda k, dt=None: jnp.asarray(
        np.stack([getattr(s, k) for s in frames]).astype(dt)
        if dt else np.stack([getattr(s, k) for s in frames]))
    return CombinedBatch(
        images=f("image", np.uint8), depth=f("depth"), campose=f("campose"),
        gt_boxes2d=f("boxes"), gt_classes=f("classes"), gt_valid=f("valid"),
        gt_masks=f("masks", bool), gt_voxels=f("voxels", bool),
        gt_nocs=f("nocs"), gt_boxes3d=f("boxes3d"), gt_ids=f("object_ids"))


class CombinedTrainer:
    def __init__(self, cfg: Config, output_dir: str = "out/combined"):
        self.cfg = cfg
        self.det_model = MaskRCNN(cfg.detection)
        self.trk_model = TrackerModel(cfg.graph)
        self.window_template = make_template(
            cfg.combined.batch_size, cfg.detection.detections_per_image,
            cfg.tracking.max_frame_dist)
        self.seq_template = make_template(
            cfg.tracking.seq_len, cfg.detection.detections_per_image,
            cfg.tracking.max_frame_dist)
        from mot3d_tpu.train.schedules import warmup_multistep
        self.det_opt = optax.adamw(
            warmup_multistep(cfg.combined.detection_lr,
                             cfg.combined.lr_warmup_iters,
                             cfg.combined.lr_warmup_factor,
                             cfg.combined.lr_steps,
                             cfg.combined.lr_gamma),
            weight_decay=cfg.combined.detection_weight_decay)
        self.trk_opt = optax.adamw(
            cfg.combined.tracking_lr,
            weight_decay=cfg.combined.tracking_weight_decay)
        self.tracker = Tracker(cfg.tracking)
        cam = cfg.camera
        self.intrinsics = make_intrinsics(cam.fx, cam.fy, cam.cx, cam.cy)
        self.writer = MetricsWriter(output_dir, cfg.run.log_every)
        self.ckpt = CheckpointManager(os.path.join(output_dir, "ckpt"))
        self.state: Optional[CombinedTrainState] = None
        self._step_fn = None

    # ------------------------------------------------------------------
    def init_state(self, window: CombinedBatch,
                   det_params=None) -> CombinedTrainState:
        """`det_params`: optional pretrained detector parameters — the
        reference's combined training starts from a TRAINED detector
        (`cfg.MODEL.WEIGHTS = .../best_model.pth`,
        `Detection/cfg_setup.py:137`), not from random init."""
        cfg = self.cfg
        from mot3d_tpu.models.mask_rcnn import GroundTruth
        gt0 = GroundTruth(boxes=window.gt_boxes2d, classes=window.gt_classes,
                          valid=window.gt_valid,
                          masks=window.gt_masks.astype(jnp.float32),
                          voxels=window.gt_voxels.astype(jnp.float32),
                          nocs=window.gt_nocs)
        if det_params is None:
            det_params = jax.jit(lambda k1, k2: self.det_model.init(
                {"params": k1}, window.images.astype(jnp.float32), gt0, k2,
                method=MaskRCNN.train_losses))(
                    jax.random.PRNGKey(cfg.run.seed),
                    jax.random.PRNGKey(cfg.run.seed + 1))
        t = cfg.tracking
        d = cfg.detection
        n_nodes = cfg.combined.batch_size * d.detections_per_image
        e2 = len(self.window_template.src_frame) * 2
        trk_params = jax.jit(lambda k: self.trk_model.init(
            k, jnp.zeros((n_nodes, 32, 32, 32)), jnp.zeros(e2, jnp.int32),
            jnp.zeros(e2, jnp.int32),
            jnp.zeros((e2, cfg.graph.edge_in_dim)), jnp.zeros(e2, bool)))(
                jax.random.PRNGKey(cfg.run.seed + 2))
        self.state = CombinedTrainState(
            det_params=det_params, det_opt_state=self.det_opt.init(det_params),
            trk_params=trk_params, trk_opt_state=self.trk_opt.init(trk_params),
            step=jnp.zeros((), jnp.int32))
        return self.state

    # ------------------------------------------------------------------
    def train(self, windows: Iterator[List[DetectionSample]],
              max_iter: Optional[int] = None,
              test_seqs: Optional[List[List[DetectionSample]]] = None,
              resume: bool = False, det_init_params=None) -> Dict[str, float]:
        """windows: iterator of T-frame windows (T = combined.batch_size,
        consecutive frames of one sequence, as the reference's non-shuffled
        2-frame batches, `train_combined.py:88,481`).  `resume` reloads the
        latest full train state — both params, both optimizer states, step
        (`Detection/train_combined.py:444-455` resume_or_load).
        `det_init_params` warm-starts the detector from a pretrained state
        (the reference protocol, see init_state)."""
        cfg = self.cfg.combined
        max_iter = max_iter or cfg.max_iter
        rng = jax.random.PRNGKey(self.cfg.run.seed + 3)
        metrics: Dict[str, float] = {}
        # Host-side step mirror: a per-iteration int(self.state.step) blocks
        # on the step's completion + a device round trip (round-5
        # steady-state study) — read once, then count locally.
        step = None
        for frames in windows:
            window = samples_to_combined_window(frames)
            batch = jax.tree_util.tree_map(lambda x: x[None], window)
            if self.state is None:
                self.init_state(window, det_params=det_init_params)
                if resume:
                    from mot3d_tpu.train.checkpoints import resume_trainer
                    resume_trainer(self)
            if step is None:
                step = int(self.state.step)
            if step >= max_iter:
                break
            if self._step_fn is None:
                self._step_fn = jax.jit(make_combined_train_step(
                    self.det_model, self.trk_model, self.window_template,
                    self.cfg, self.det_opt, self.trk_opt,
                    joint_grad=self.cfg.combined.joint_grad,
                    accum_windows=self.cfg.combined.accum_windows))
            rng, sub = jax.random.split(rng)
            self.state, metrics = self._step_fn(self.state, batch, sub)
            step += 1
            self.writer.write(step, metrics)
            if test_seqs is not None and step % cfg.eval_period == 0:
                mota = self.do_test(test_seqs)
                if self.ckpt.update_best("mota", mota["mota"], step,
                                         self.state):
                    print(f"new best MOTA {mota['mota']:.4f} at step {step}")
            if step % cfg.checkpoint_period == 0:
                self.ckpt.save(step, self.state)
        self.writer.flush()
        return {k: float(v) for k, v in metrics.items()}

    # ------------------------------------------------------------------
    def _eval_fns(self):
        if not hasattr(self, "_predict"):
            self._predict = jax.jit(lambda p, im: self.det_model.apply(
                p, im, method=MaskRCNN.predict))
            self._pose = jax.jit(
                lambda bx, sc, cl, va, ma, vo, no, g2, gv, de, cp, g3, k:
                postprocess_frame(bx, sc, cl, va, ma, vo, no, g2, gv, de,
                                  cp, self.intrinsics, g3, k, self.cfg))

            def fwd(trk_params, det_valid, trans, rots, scales, boxes3d,
                    voxels, gt_boxes, gt_ids, gt_valid):
                graph = build_graph(self.seq_template, self.cfg.tracking,
                                    det_valid, trans, rots, scales, boxes3d,
                                    gt_boxes, gt_ids, gt_valid)
                vox = voxels.reshape(-1, 32, 32, 32)
                logits = self.trk_model.apply(trk_params, vox, graph.src,
                                              graph.dst, graph.edge_attr,
                                              graph.edge_mask)
                return graph, jax.nn.sigmoid(logits[-1])
            self._track = jax.jit(fwd)
        return self._predict, self._pose, self._track

    def do_test(self, sequences: List[List[DetectionSample]],
                classwise: bool = True) -> Dict[str, float]:
        """Full eval: detector -> pose -> tracker -> accumulated MOTA
        (`train_combined.py:128-433`)."""
        predict, pose, track = self._eval_fns()
        T = self.cfg.tracking.seq_len
        D = self.cfg.detection.detections_per_image
        summaries = []
        per_class_acc: Dict[str, list] = {}
        rng = jax.random.PRNGKey(7)
        for frames in sequences:
            frames = frames[:T]
            window = samples_to_combined_window(frames)
            dets = predict(self.state.det_params, window.images)
            frame_outs = []
            for t in range(len(frames)):
                rng, sub = jax.random.split(rng)
                frame_outs.append(pose(
                    dets.boxes[t], dets.scores[t], dets.classes[t],
                    dets.valid[t], dets.masks[t], dets.voxels[t],
                    dets.nocs[t], window.gt_boxes2d[t], window.gt_valid[t],
                    window.depth[t], window.campose[t],
                    window.gt_boxes3d[t], sub))
            stack = lambda f: jnp.stack([getattr(o, f) for o in frame_outs])
            pad_t = T - len(frames)
            padz = lambda x: jnp.pad(x, [(0, pad_t)] + [(0, 0)] * (x.ndim - 1))
            det_valid = padz(stack("valid"))
            trans = padz(stack("translations"))
            rots = padz(stack("rotations"))
            scales = padz(stack("scales"))
            boxes3d = padz(stack("pred_boxes"))
            voxels = padz(stack("voxels"))
            gt_boxes = padz(window.gt_boxes3d)
            gt_ids = padz(window.gt_ids)
            gt_valid3 = padz(window.gt_valid)
            graph, probs = track(self.state.trk_params, det_valid, trans,
                                 rots, scales, boxes3d, voxels, gt_boxes,
                                 gt_ids, gt_valid3)
            e = len(self.seq_template.src_frame)
            classes = padz(jnp.stack([dets.classes[t]
                                      for t in range(len(frames))]))
            pred = self.tracker.assemble(
                self.seq_template, np.asarray(probs)[:e],
                np.asarray(graph.obj_ids), np.asarray(det_valid),
                np.asarray(trans), np.asarray(classes))
            gt_locs = np.stack([f.locations for f in frames])
            gt_locs = np.pad(gt_locs, ((0, pad_t), (0, 0), (0, 0)))
            gt_cls = np.stack([f.classes for f in frames])
            gt_cls = np.pad(gt_cls, ((0, pad_t), (0, 0)))
            gt = self.tracker.gt_trajectories(
                np.asarray(gt_ids), np.asarray(gt_valid3), gt_locs, gt_cls)
            if classwise:
                summary, per_class = self.tracker.evaluate(pred, gt, True)
                for k, v in per_class.items():
                    per_class_acc.setdefault(k, []).append(v)
            else:
                summary = self.tracker.evaluate(pred, gt)
            summaries.append(summary)
        out = {
            "mota": accumulated_mota(summaries),
            "idf1": accumulated_idf1(summaries),
            "precision": float(np.mean([s["precision"] for s in summaries])),
            "recall": float(np.mean([s["recall"] for s in summaries])),
        }
        for k, v in per_class_acc.items():
            out[f"mota_{k}"] = accumulated_mota(v)
        self.writer.write(int(self.state.step) if self.state else 0, out,
                          split="test", echo=True)
        return out
