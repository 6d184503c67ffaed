"""Drive the tracking stack end-to-end on the default (TPU) platform:
synthetic 25-frame sequence -> h5 interchange roundtrip -> padded graph ->
TrackerModel forward (jit) -> trajectory assembly -> MOTA.

This is the reference's `Tracking/inference.py` flow
(`Tracking/mpn_trainer.py:216-351`) expressed through mot3d_tpu's public API.
Run: PYTHONPATH=/root/repo:$PYTHONPATH python examples/drive_tracker.py
"""

import tempfile, os
import numpy as np

from mot3d_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

print("devices:", jax.devices())

from mot3d_tpu.config import TrackingConfig, GraphConfig
from mot3d_tpu.data.synthetic import synthetic_sequence
from mot3d_tpu.data.h5_io import (FrameDetections, write_frame_h5,
                                  read_frame_h5, pad_sequence)
from mot3d_tpu.models import TrackerModel
from mot3d_tpu.models.mpn import tracker_loss
from mot3d_tpu.tracking import Tracker, build_graph
from mot3d_tpu.tracking.graph_builder import make_template

tcfg = TrackingConfig()           # full-size: 25 frames, 8 slots, window 5
gcfg = GraphConfig()
seq = synthetic_sequence(tcfg, seed=1, num_objects=5, noise=0.02,
                         drop_prob=0.08, fp_prob=0.15)

# --- h5 interchange roundtrip (reference inference_detector.py schema) ----
tmp = tempfile.mkdtemp()
for t in range(tcfg.seq_len):
    n = int(seq.det_valid[t].sum())
    g = int(seq.gt_valid[t].sum())
    write_frame_h5(os.path.join(tmp, f"{t}.h5"), FrameDetections(
        classes=seq.classes[t, :n], objectness_scores=np.ones(n),
        voxels=seq.voxels[t, :n], rotations=seq.rotations[t, :n],
        translations=seq.translations[t, :n], scales=seq.scales[t, :n],
        pred_boxes=seq.pred_boxes[t, :n], gt_ids=seq.gt_ids[t, :g],
        gt_boxes=seq.gt_boxes[t, :g], gt_voxels=np.zeros((g, 32, 32, 32)),
        gt_rotations=seq.gt_rotations[t, :g], gt_locations=seq.gt_locations[t, :g],
        gt_scales=seq.gt_scales[t, :g], gt_compl_boxes=seq.gt_boxes[t, :g],
        gt_classes=seq.gt_classes[t, :g]))
frames = [read_frame_h5(os.path.join(tmp, f"{t}.h5")) for t in range(tcfg.seq_len)]
padded = pad_sequence(frames, tcfg.max_instances_per_frame,
                      tcfg.max_instances_per_frame)
print("h5 roundtrip: detections", int(padded["det_valid"].sum()),
      "(direct:", int(seq.det_valid.sum()), ")")

# --- graph + model forward, one jitted program --------------------------
template = make_template(tcfg.seq_len, tcfg.max_instances_per_frame,
                         tcfg.max_frame_dist)
model = TrackerModel(gcfg)

@jax.jit
def forward(params, p):
    graph = build_graph(template, tcfg, p["det_valid"], p["translations"],
                        p["rotations"], p["scales"], p["pred_boxes"],
                        p["gt_boxes"], p["gt_ids"], p["gt_valid"])
    vox = p["voxels"].reshape(-1, 32, 32, 32)
    logits = model.apply(params, vox, graph.src, graph.dst,
                         graph.edge_attr, graph.edge_mask)
    loss = tracker_loss(logits, graph.targets, graph.edge_mask)
    return graph, jax.nn.sigmoid(logits[-1]), loss

jp = {k: jnp.array(v) for k, v in padded.items()}
params = jax.jit(lambda k: model.init(
    k, jp["voxels"].reshape(-1, 32, 32, 32),
    jnp.zeros(10, jnp.int32), jnp.zeros(10, jnp.int32),
    jnp.zeros((10, 8)), jnp.zeros(10, bool)))(jax.random.PRNGKey(0))
graph, probs, loss = forward(params, jp)
e = len(template.src_frame)
print("graph: %d/%d valid edges, %d FPs, loss %.3f" % (
    int(graph.edge_mask.sum()), graph.edge_mask.shape[0],
    int(graph.false_positives), float(loss)))

# --- trajectories + MOTA -------------------------------------------------
tracker = Tracker(tcfg)
gt_trajs = tracker.gt_trajectories(padded["gt_ids"], padded["gt_valid"],
                                   padded["gt_locations"], padded["gt_classes"])

for name, p in (("untrained", np.asarray(probs)[:e]),
                ("oracle", np.asarray(graph.targets)[:e])):
    pred_trajs = tracker.assemble(template, p, np.asarray(graph.obj_ids),
                                  padded["det_valid"], padded["translations"],
                                  padded["classes"])
    s, per_class = tracker.evaluate(pred_trajs, gt_trajs, classwise=True)
    print(f"{name}: MOTA {s['mota']:.3f} prec {s['precision']:.3f} "
          f"recall {s['recall']:.3f} switches {s['num_switches']} "
          f"({len(per_class)} classes)")

# probe: an entirely empty sequence must not crash anything
empty = {k: jnp.zeros_like(v) for k, v in jp.items()}
g0, p0, l0 = forward(params, empty)
print("PROBE empty sequence: edges", int(g0.edge_mask.sum()),
      "loss finite:", bool(jnp.isfinite(l0)))
