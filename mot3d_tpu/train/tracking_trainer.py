"""Standalone tracking trainer: the reference `Tracking/mpn_trainer.py`
Trainer (train / val / inference with MOTA) on padded sequence tensors.

Data: a list of padded sequence dicts (from `data.h5_io.pad_sequence` over
per-frame .h5 files, or `data.synthetic.synthetic_sequence`).  The train
step is jit-compiled once and batches sequences over the data mesh axis when
one is provided.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mot3d_tpu.config import Config
from mot3d_tpu.models.mpn import TrackerModel, tracker_loss
from mot3d_tpu.parallel.train_step import (TrackingBatch, TrackingTrainState,
                                           make_tracking_train_step)
from mot3d_tpu.tracking import Tracker, build_graph
from mot3d_tpu.tracking.graph_builder import make_template
from mot3d_tpu.tracking.mot_metrics import (accumulated_idf1,
                                             accumulated_mota)
from mot3d_tpu.train.checkpoints import CheckpointManager
from mot3d_tpu.train.metrics_writer import MetricsWriter


def sequences_to_batch(seqs: List[dict]) -> TrackingBatch:
    """Stack padded sequence dicts (field names of SyntheticSequence /
    pad_sequence) into a TrackingBatch."""
    f = lambda k: jnp.asarray(np.stack([np.asarray(s[k]) for s in seqs]))
    return TrackingBatch(
        det_valid=f("det_valid"), translations=f("translations"),
        rotations=f("rotations"), scales=f("scales"),
        pred_boxes=f("pred_boxes"), voxels=f("voxels"),
        gt_boxes=f("gt_boxes"), gt_ids=f("gt_ids"), gt_valid=f("gt_valid"))


class TrackingTrainer:
    """Mirrors `Tracking/mpn_trainer.py:34-214` (model bundle + Adam + epoch
    loop) and :216-351/:728-809 (inference/val with MOTA)."""

    def __init__(self, cfg: Config, output_dir: str = "out/tracking"):
        self.cfg = cfg
        self.model = TrackerModel(cfg.graph)
        self.template = make_template(cfg.tracking.seq_len,
                                      cfg.tracking.max_instances_per_frame,
                                      cfg.tracking.max_frame_dist)
        self.optimizer = optax.adamw(cfg.tracking.learning_rate,
                                     weight_decay=cfg.tracking.weight_decay)
        self.tracker = Tracker(cfg.tracking)
        self.output_dir = output_dir
        self.writer = MetricsWriter(output_dir, cfg.run.log_every)
        self.ckpt = CheckpointManager(os.path.join(output_dir, "ckpt"))
        self._step_fn = None
        self.state: Optional[TrackingTrainState] = None

    # ------------------------------------------------------------------
    def init_state(self, sample: TrackingBatch) -> TrackingTrainState:
        t = self.cfg.tracking
        n_nodes = t.seq_len * t.max_instances_per_frame
        e2 = len(self.template.src_frame) * (2 if t.undirected else 1)
        params = jax.jit(lambda k: self.model.init(
            k, jnp.zeros((n_nodes, 32, 32, 32)), jnp.zeros(e2, jnp.int32),
            jnp.zeros(e2, jnp.int32),
            jnp.zeros((e2, self.cfg.graph.edge_in_dim)),
            jnp.zeros(e2, bool)))(jax.random.PRNGKey(self.cfg.run.seed))
        self.state = TrackingTrainState(params, self.optimizer.init(params),
                                        jnp.zeros((), jnp.int32))
        return self.state

    def _step(self):
        if self._step_fn is None:
            self._step_fn = jax.jit(make_tracking_train_step(
                self.model, self.template, self.cfg, self.optimizer))
        return self._step_fn

    # ------------------------------------------------------------------
    def train(self, train_seqs: List[dict], val_seqs: List[dict],
              num_epochs: Optional[int] = None,
              batch_size: Optional[int] = None,
              resume: bool = False) -> Dict[str, float]:
        t = self.cfg.tracking
        num_epochs = num_epochs or t.num_epochs
        batch_size = batch_size or t.batch_size
        if self.state is None:
            self.init_state(sequences_to_batch(train_seqs[:1]))
        start_epoch = 0
        if resume:
            from mot3d_tpu.train.checkpoints import resume_trainer
            step0 = resume_trainer(self)
            if step0 is not None:
                # Epoch-based loop: skip the epochs the restored step has
                # already completed (the per-epoch RNG order is re-derived
                # identically from the seed).
                per_epoch = max(1, len(train_seqs) // max(1, batch_size))
                start_epoch = min(num_epochs, step0 // per_epoch)
        step_fn = self._step()
        rng = np.random.default_rng(self.cfg.run.seed)
        last: Dict[str, float] = {}
        for epoch in range(num_epochs):
            if epoch < start_epoch:
                rng.permutation(len(train_seqs))  # keep the order stream
                continue
            order = rng.permutation(len(train_seqs))
            for i in range(0, len(order) - batch_size + 1, batch_size):
                batch = sequences_to_batch(
                    [train_seqs[j] for j in order[i:i + batch_size]])
                self.state, metrics = step_fn(self.state, batch)
                step = int(self.state.step)
                self.writer.write(step, metrics)
            val = self.validate(val_seqs)
            self.writer.write(int(self.state.step), val, split="val",
                              echo=True)
            self.ckpt.update_best("mota", val["mota"], int(self.state.step),
                                  self.state)
            self.ckpt.save(int(self.state.step), self.state)
            last = val
        return last

    # ------------------------------------------------------------------
    def _forward_sequence(self, seq: dict):
        """Edge probabilities + graph for one sequence (jit, cached)."""
        if not hasattr(self, "_fwd"):
            def fwd(params, s: TrackingBatch):
                graph = build_graph(self.template, self.cfg.tracking,
                                    s.det_valid, s.translations, s.rotations,
                                    s.scales, s.pred_boxes, s.gt_boxes,
                                    s.gt_ids, s.gt_valid)
                vox = s.voxels.reshape(-1, 32, 32, 32)
                logits = self.model.apply(params, vox, graph.src, graph.dst,
                                          graph.edge_attr, graph.edge_mask)
                loss = tracker_loss(logits, graph.targets, graph.edge_mask)
                return graph, jax.nn.sigmoid(logits[-1]), loss
            self._fwd = jax.jit(fwd)
        batch = sequences_to_batch([seq])
        single = jax.tree_util.tree_map(lambda x: x[0], batch)
        return self._fwd(self.state.params, single)

    def validate(self, seqs: List[dict], classwise: bool = False,
                 export_dir: str = None):
        """Per-sequence MOTA + mean loss (`mpn_trainer.py:728-809`).

        export_dir: when given, write per-sequence visualisations
        (trajectory PLYs + interactive replay.html with pred AND GT
        tracks — the reference's visualise_pred_sequence replay)."""
        summaries, losses = [], []
        e = len(self.template.src_frame)
        per_class_acc: Dict[str, list] = {}
        for si, seq in enumerate(seqs):
            graph, probs, loss = self._forward_sequence(seq)
            # One device->host fetch per sequence (separate np.asarray /
            # float() calls each pay a device round trip).
            probs, obj_ids, loss = jax.device_get(
                (probs, graph.obj_ids, loss))
            losses.append(float(loss))
            pred = self.tracker.assemble(
                self.template, probs[:e], obj_ids,
                np.asarray(seq["det_valid"]),
                np.asarray(seq["translations"]), np.asarray(seq["classes"]))
            gt = self.tracker.gt_trajectories(
                np.asarray(seq["gt_ids"]), np.asarray(seq["gt_valid"]),
                np.asarray(seq["gt_locations"]), np.asarray(seq["gt_classes"]))
            if export_dir is not None:
                from mot3d_tpu.tracking.visualise import export_sequence
                export_sequence(os.path.join(export_dir, f"seq_{si:03d}"),
                                pred, gt_trajectories=gt)
            if classwise:
                summary, per_class = self.tracker.evaluate(pred, gt, True)
                for k, v in per_class.items():
                    per_class_acc.setdefault(k, []).append(v)
            else:
                summary = self.tracker.evaluate(pred, gt)
            summaries.append(summary)
        out = {
            "val_loss": float(np.mean(losses)) if losses else 0.0,
            "mota": accumulated_mota(summaries),
            "idf1": accumulated_idf1(summaries),
            "precision": float(np.mean([s["precision"] for s in summaries])),
            "recall": float(np.mean([s["recall"] for s in summaries])),
            "switches": float(sum(s["num_switches"] for s in summaries)),
        }
        if classwise:
            for k, v in per_class_acc.items():
                out[f"mota_{k}"] = accumulated_mota(v)
        return out

    def inference(self, seqs: List[dict], classwise: bool = True,
                  export_dir: str = None):
        """`Tracking/inference.py` path: eval pretrained models on test
        sequences, print accumulated + per-class MOTA; optionally export
        per-sequence replay/PLY visualisations."""
        result = self.validate(seqs, classwise=classwise,
                               export_dir=export_dir)
        for k, v in sorted(result.items()):
            print(f"{k}: {v:.4f}")
        return result
