"""Train-resume: a killed run continues from its checkpoint with the FULL
state (params, optimizer state, step), reproducing the uninterrupted run —
the reference's `DetectionCheckpointer.resume_or_load(resume=True)` path
(`Detection/train_net.py:99-110`) which reloads model + optimizer +
scheduler + iteration.
"""

import dataclasses

import jax
import numpy as np

from mot3d_tpu.config import Config, TrackingConfig
from mot3d_tpu.data.synthetic import synthetic_sequence
from mot3d_tpu.train.schedules import warmup_multistep
from mot3d_tpu.train.tracking_trainer import TrackingTrainer


def _cfg():
    trk = TrackingConfig(seq_len=3, max_instances_per_frame=4,
                         max_frame_dist=2, batch_size=2)
    return Config().replace(tracking=trk)


def _seqs(cfg, n=4):
    return [synthetic_sequence(cfg.tracking, seed=i, num_objects=3,
                               noise=0.01)._asdict() for i in range(n)]


def test_kill_and_resume_matches_uninterrupted(tmp_path):
    cfg = _cfg()
    train = _seqs(cfg, n=2)
    val = _seqs(cfg, n=1)

    # Uninterrupted 3-epoch run.
    full = TrackingTrainer(cfg, output_dir=str(tmp_path / "full"))
    full.train(train, val, num_epochs=3)

    # "Killed" after 1 epoch ...
    part_dir = str(tmp_path / "part")
    part = TrackingTrainer(cfg, output_dir=part_dir)
    part.train(train, val, num_epochs=1)
    step_at_kill = int(part.state.step)
    assert step_at_kill == 1 * (len(train) // cfg.tracking.batch_size)

    # ... then a FRESH trainer resumes from the same output dir and runs to
    # the same total epoch count.  The restored optimizer state + re-derived
    # per-epoch shuffle stream make the continuation bit-comparable to the
    # uninterrupted run (loss curve continuous, not restarted).
    resumed = TrackingTrainer(cfg, output_dir=part_dir)
    resumed.train(train, val, num_epochs=3, resume=True)

    assert int(resumed.state.step) == int(full.state.step)
    for a, b in zip(jax.tree_util.tree_leaves(full.state.params),
                    jax.tree_util.tree_leaves(resumed.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_resume_without_checkpoint_is_fresh_start(tmp_path):
    cfg = _cfg()
    train, val = _seqs(cfg), _seqs(cfg, n=2)
    tr = TrackingTrainer(cfg, output_dir=str(tmp_path / "none"))
    tr.train(train[:2], val[:1], num_epochs=1, resume=True)  # no ckpt: trains
    assert int(tr.state.step) >= 1


def test_warmup_multistep_schedule_shape():
    # detectron2 WarmupMultiStepLR semantics (`Detection/cfg_setup.py:109-114`).
    sch = warmup_multistep(1e-3, warmup_iters=10, warmup_factor=0.1,
                           steps=(20, 30), gamma=0.1)
    assert np.isclose(float(sch(0)), 1e-4)
    assert np.isclose(float(sch(5)), 1e-3 * 0.55)
    assert np.isclose(float(sch(10)), 1e-3)
    assert np.isclose(float(sch(19)), 1e-3)
    assert np.isclose(float(sch(20)), 1e-4)
    assert np.isclose(float(sch(30)), 1e-5)
    # Reference-shipped neutral values -> constant (exact parity).
    const = warmup_multistep(8e-4)
    assert np.isclose(float(const(0)), 8e-4)
    assert np.isclose(float(const(239_999)), 8e-4)


def test_detection_trainer_resume(tmp_path):
    """Detection path: init, train 2 steps, kill, resume -> step continues
    and the LR-schedule state (inside the restored optimizer) continues."""
    from mot3d_tpu.data.detection_loader import DetectionSample
    from mot3d_tpu.data.synthetic_detection import synthetic_detection_scene
    from mot3d_tpu.models.mask_rcnn import MaskRCNN  # noqa: F401 (import check)
    from mot3d_tpu.train.detection_trainer import DetectionTrainer
    from tests.test_detection_model import DCFG

    cfg = Config().replace(detection=DCFG)
    cfg = cfg.replace(combined=dataclasses.replace(
        cfg.combined, checkpoint_period=1))

    def batches():
        for i in range(4):
            sc = synthetic_detection_scene(DCFG, batch=1, num_objects=2,
                                           seed=i)
            M = sc.boxes.shape[1]
            yield DetectionSample(
                image=sc.images, depth=np.ones((1, 64, 64), np.float32),
                campose=np.tile(np.eye(4, dtype=np.float32), (1, 1, 1)),
                boxes=sc.boxes, classes=sc.classes, valid=sc.valid,
                masks=sc.masks, voxels=sc.voxels, nocs=sc.nocs,
                boxes3d=np.zeros((1, M, 8, 3), np.float32),
                object_ids=np.arange(M, dtype=np.int32)[None],
                locations=np.zeros((1, M, 3), np.float32),
                rotations=np.zeros((1, M, 3), np.float32),
                scales3d=np.ones((1, M), np.float32))

    out = str(tmp_path / "det")
    tr = DetectionTrainer(cfg, output_dir=out)
    tr.train(batches(), max_iter=2)
    assert int(tr.state.step) == 2

    tr2 = DetectionTrainer(cfg, output_dir=out)
    tr2.train(batches(), max_iter=3, resume=True)
    assert int(tr2.state.step) == 3
