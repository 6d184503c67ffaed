"""Siamese (non-graph) tracking trainer.

Rebuild of the reference's second trainer (`Tracking/trainer.py:33-978`, the
``--use_graph=False`` path): consecutive-frame instance pairs classified
from voxel appearance embeddings + a relative-pose edge embedding, with the
paper's ablations (``no_pose``/``no_geo``/``use_triplet``/``use_l1``,
`Tracking/options.py:36-83`) and the feature precompute path
(`Tracking/trainer.py:216-449` precompute-to-hdf5).

TPU design: the pair structure is the padded graph template restricted to
dt == 1 (directed — the siamese variant has no message passing, so no
undirected duplication), built once per config; each training step is one
jit program over a batch of sequences; triplet mining is two segment-max
reductions (models/siamese.py) instead of the reference's triple loop.
Precompute runs the voxel encoder once per sequence and caches the (T, I, D)
embedding tensors (in-memory or .npz on disk); later epochs train only the
edge encoder + classifier from the cache — the same split the reference's
hdf5 cache realises.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mot3d_tpu.config import Config
from mot3d_tpu.models.siamese import (SiameseTracker, mine_triplets,
                                      siamese_bce_loss, siamese_edge_features,
                                      siamese_l1_loss, triplet_loss)
from mot3d_tpu.parallel.train_step import TrackingBatch
from mot3d_tpu.tracking import Tracker, build_graph
from mot3d_tpu.tracking.graph_builder import make_template
from mot3d_tpu.tracking.mot_metrics import (accumulated_idf1,
                                             accumulated_mota)
from mot3d_tpu.train.checkpoints import CheckpointManager
from mot3d_tpu.train.metrics_writer import MetricsWriter
from mot3d_tpu.train.tracking_trainer import sequences_to_batch


class SiameseTrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def _loss_from_graph(model: SiameseTracker, cfg: Config, params, graph,
                     voxels, features):
    """Loss for one sequence graph.  `voxels` (N, 32, 32, 32) or None when
    training from precomputed `features` (N, D)."""
    s = cfg.siamese
    rel_pose = siamese_edge_features(graph.edge_attr)
    if s.no_geo:
        h = None
    elif features is not None:
        h = features
    else:
        h = model.apply(params, voxels, method=SiameseTracker.encode)
    logits = model.apply(params, h, graph.src, graph.dst, rel_pose,
                         graph.edge_mask, method=SiameseTracker.classify)
    if s.use_triplet:
        # Triplet REPLACES the edge loss, as in the reference
        # (`Tracking/trainer.py:565-567`); the classifier is then trained
        # only if BCE is also on, which the reference never does.
        anchor, pos, neg, valid = mine_triplets(
            h, graph.src, graph.dst, graph.targets, graph.edge_mask)
        return triplet_loss(anchor, pos, neg, valid, s.triplet_margin)
    if s.use_l1:
        return siamese_l1_loss(logits, graph.targets, graph.edge_mask)
    return siamese_bce_loss(logits, graph.targets, graph.edge_mask,
                            s.pos_weight_max, s.logit_clamp)


def make_siamese_train_step(model: SiameseTracker, template, cfg: Config,
                            optimizer: optax.GradientTransformation,
                            trk_cfg, from_features: bool = False):
    """Returns a jittable (state, batch[, features]) -> (state, metrics) step.

    `trk_cfg` is the directed dt==1 TrackingConfig used for graph building.
    With `from_features=True` the step takes a (B, N, D) embedding tensor
    instead of encoding voxels (precompute path).
    """

    def seq_loss(params, seq: TrackingBatch, feats):
        graph = build_graph(template, trk_cfg, seq.det_valid,
                            seq.translations, seq.rotations, seq.scales,
                            seq.pred_boxes, seq.gt_boxes, seq.gt_ids,
                            seq.gt_valid)
        vox = seq.voxels.reshape(-1, *seq.voxels.shape[-3:])
        return _loss_from_graph(model, cfg, params, graph,
                                None if from_features else vox, feats)

    def step(state: SiameseTrainState, batch: TrackingBatch, features=None):
        def loss_fn(params):
            if from_features:
                losses = jax.vmap(
                    lambda s, f: seq_loss(params, s, f))(batch, features)
            else:
                losses = jax.vmap(
                    lambda s: seq_loss(params, s, None))(batch)
            return losses.mean()

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return (SiameseTrainState(params, opt_state, state.step + 1),
                {"siamese_loss": loss})

    return step


class SiameseTrainer:
    """Mirrors `Tracking/trainer.py` Trainer: model bundle + Adam + epoch
    loop (:197-214), precompute (:216-237), val/inference with MOTA
    (:239-364, :725-805)."""

    def __init__(self, cfg: Config, output_dir: str = "out/siamese"):
        if cfg.siamese.no_pose and cfg.siamese.no_geo:
            raise ValueError("no_pose and no_geo cannot both be set "
                             "(classifier would have no input)")
        if cfg.siamese.use_triplet and cfg.siamese.no_geo:
            raise ValueError("use_triplet needs appearance embeddings "
                             "(no_geo drops them)")
        self.cfg = cfg
        self.model = SiameseTracker(cfg.siamese)
        # Directed, consecutive-frames-only pair structure
        # (`Tracking/datasets/siamese_dataset.py:93` iterates t -> t+1 only).
        self.trk_cfg = dataclasses.replace(cfg.tracking, undirected=False,
                                           max_frame_dist=1)
        self.template = make_template(self.trk_cfg.seq_len,
                                      self.trk_cfg.max_instances_per_frame,
                                      1)
        self.optimizer = optax.adamw(cfg.siamese.learning_rate,
                                     weight_decay=cfg.siamese.weight_decay)
        self.tracker = Tracker(self.trk_cfg)
        self.output_dir = output_dir
        self.writer = MetricsWriter(output_dir, cfg.run.log_every)
        self.ckpt = CheckpointManager(os.path.join(output_dir, "ckpt"))
        self._step_fn = {}
        self.state: Optional[SiameseTrainState] = None

    # ------------------------------------------------------------------
    def init_state(self, sample=None) -> SiameseTrainState:
        t = self.trk_cfg
        s = self.cfg.siamese
        n_nodes = t.seq_len * t.max_instances_per_frame
        e = len(self.template.src_frame)
        vox = jnp.zeros((n_nodes, 32, 32, 32))
        params = jax.jit(lambda k: self.model.init(
            k, vox, jnp.zeros(e, jnp.int32), jnp.zeros(e, jnp.int32),
            jnp.zeros((e, 7)), jnp.zeros(e, bool)))(
                jax.random.PRNGKey(self.cfg.run.seed))
        self.state = SiameseTrainState(params, self.optimizer.init(params),
                                       jnp.zeros((), jnp.int32))
        return self.state

    def _step(self, from_features: bool):
        if from_features not in self._step_fn:
            self._step_fn[from_features] = jax.jit(make_siamese_train_step(
                self.model, self.template, self.cfg, self.optimizer,
                self.trk_cfg, from_features))
        return self._step_fn[from_features]

    # ------------------------------------------------------------------
    def precompute_features(self, seqs: List[dict],
                            cache_dir: Optional[str] = None) -> List[np.ndarray]:
        """Voxel-encoder embeddings per sequence, optionally cached to .npz
        (`Tracking/trainer.py:396-449` precompute-to-hdf5 equivalent).
        Returns a list of (N, D) arrays aligned with `seqs`."""
        if self.cfg.siamese.no_geo:
            raise ValueError("no_geo has no appearance features")
        if self.state is None:
            self.init_state()
        if not hasattr(self, "_encode"):
            self._encode = jax.jit(lambda p, v: self.model.apply(
                p, v, method=SiameseTracker.encode))
        out = []
        for i, seq in enumerate(seqs):
            path = (os.path.join(cache_dir, f"feats_{i:05d}.npz")
                    if cache_dir else None)
            if path and os.path.exists(path):
                out.append(np.load(path)["appearance"])
                continue
            vox = jnp.asarray(np.asarray(seq["voxels"]).reshape(
                -1, 32, 32, 32))
            feats = np.asarray(self._encode(self.state.params, vox))
            if path:
                os.makedirs(cache_dir, exist_ok=True)
                np.savez_compressed(path, appearance=feats)
            out.append(feats)
        return out

    # ------------------------------------------------------------------
    def train(self, train_seqs: List[dict], val_seqs: List[dict],
              num_epochs: Optional[int] = None,
              batch_size: Optional[int] = None,
              precompute: bool = False,
              cache_dir: Optional[str] = None,
              resume: bool = False) -> Dict[str, float]:
        s = self.cfg.siamese
        num_epochs = num_epochs or s.num_epochs
        batch_size = batch_size or s.batch_size
        if self.state is None:
            self.init_state()
        start_epoch = 0
        if resume:
            from mot3d_tpu.train.checkpoints import resume_trainer
            step0 = resume_trainer(self)
            if step0 is not None:
                per_epoch = max(1, len(train_seqs)
                                // max(1, min(batch_size, len(train_seqs))))
                start_epoch = min(num_epochs, step0 // per_epoch)
        from_features = bool(precompute and not s.no_geo)
        feats = (self.precompute_features(train_seqs, cache_dir)
                 if from_features else None)
        step_fn = self._step(from_features)
        rng = np.random.default_rng(self.cfg.run.seed)
        last: Dict[str, float] = {}
        # Fewer sequences than batch_size must still train (otherwise the
        # epoch loop is empty and an untrained model gets checkpointed).
        batch_size = max(1, min(batch_size, len(train_seqs)))
        for epoch in range(num_epochs):
            order = rng.permutation(len(train_seqs))
            if epoch < start_epoch:
                continue  # resumed past this epoch; order stream consumed
            for i in range(0, len(order) - batch_size + 1, batch_size):
                idx = order[i:i + batch_size]
                batch = sequences_to_batch([train_seqs[j] for j in idx])
                if from_features:
                    fb = jnp.asarray(np.stack([feats[j] for j in idx]))
                    self.state, metrics = step_fn(self.state, batch, fb)
                else:
                    self.state, metrics = step_fn(self.state, batch)
                self.writer.write(int(self.state.step), metrics)
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
        if not hasattr(self, "_fwd"):
            def fwd(params, s: TrackingBatch):
                graph = build_graph(self.template, self.trk_cfg, s.det_valid,
                                    s.translations, s.rotations, s.scales,
                                    s.pred_boxes, s.gt_boxes, s.gt_ids,
                                    s.gt_valid)
                vox = s.voxels.reshape(-1, 32, 32, 32)
                rel_pose = siamese_edge_features(graph.edge_attr)
                logits, _ = self.model.apply(params, vox, graph.src,
                                             graph.dst, rel_pose,
                                             graph.edge_mask)
                loss = siamese_bce_loss(logits, graph.targets,
                                        graph.edge_mask,
                                        self.cfg.siamese.pos_weight_max,
                                        self.cfg.siamese.logit_clamp)
                return graph, jax.nn.sigmoid(logits), loss
            self._fwd = jax.jit(fwd)
        batch = sequences_to_batch([seq])
        single = jax.tree_util.tree_map(lambda x: x[0], batch)
        return self._fwd(self.state.params, single)

    def validate(self, seqs: List[dict], classwise: bool = False,
                 export_dir: str = None):
        """Per-sequence MOTA + mean BCE loss (`Tracking/trainer.py:725-805`).
        export_dir: write per-sequence replay/PLY visualisations."""
        summaries, losses = [], []
        per_class_acc: Dict[str, list] = {}
        for si, seq in enumerate(seqs):
            graph, probs, loss = self._forward_sequence(seq)
            losses.append(float(loss))
            pred = self.tracker.assemble(
                self.template, np.asarray(probs),
                np.asarray(graph.obj_ids), np.asarray(seq["det_valid"]),
                np.asarray(seq["translations"]), np.asarray(seq["classes"]))
            gt = self.tracker.gt_trajectories(
                np.asarray(seq["gt_ids"]), np.asarray(seq["gt_valid"]),
                np.asarray(seq["gt_locations"]),
                np.asarray(seq["gt_classes"]))
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
        result = self.validate(seqs, classwise=classwise,
                               export_dir=export_dir)
        for k, v in sorted(result.items()):
            print(f"{k}: {v:.4f}")
        return result
