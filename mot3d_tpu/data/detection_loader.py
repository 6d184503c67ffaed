"""MOTFront -> padded detection training batches.

The reference's per-image mapper (`Detection/data/mapper_heads.py:31-307`,
VoxNocsMapper) does png/hdf5/binvox I/O + per-annotation crops inside the
torch DataLoader; here the same work produces *fixed-shape* padded tensors
(GroundTruth + image + depth + campose) ready for the jit train step, with a
simple background-thread prefetcher (the north-star fused input pipeline
lands later; this is the host-side feeder).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, NamedTuple

import numpy as np

from mot3d_tpu.config import DetectionConfig
from mot3d_tpu.data.motfront import (MOTFrontDataset, crop_normalise_nocs,
                                     load_depth_campose, load_nocs_png,
                                     load_rgb_png, polygons_to_mask)


class DetectionSample(NamedTuple):
    """One padded frame (numpy, host)."""

    image: np.ndarray        # (pad_H, pad_W, 3) float32 RGB
    depth: np.ndarray        # (H, W)
    campose: np.ndarray      # (4, 4)
    boxes: np.ndarray        # (M, 4) XYXY
    classes: np.ndarray      # (M,)
    valid: np.ndarray        # (M,)
    masks: np.ndarray        # (M, pad_H, pad_W)
    voxels: np.ndarray       # (M, 32, 32, 32)
    nocs: np.ndarray         # (M, P, P, 3)
    boxes3d: np.ndarray      # (M, 8, 3) world corners
    object_ids: np.ndarray   # (M,)
    locations: np.ndarray    # (M, 3)
    rotations: np.ndarray    # (M, 3)
    scales3d: np.ndarray     # (M,)


def _resize_patch(patch: np.ndarray, size: int) -> np.ndarray:
    import cv2
    if patch.size == 0:
        return np.zeros((size, size, 3), np.float32)
    return cv2.resize(patch, (size, size), interpolation=cv2.INTER_LINEAR)


def load_frame(ds: MOTFrontDataset, frame, cfg: DetectionConfig,
               nocs_patch_size: int = 28,
               load_voxels: bool = True) -> DetectionSample:
    """Load + pad one frame record (see MOTFrontDataset.load_scene)."""
    M = cfg.max_instances
    img = load_rgb_png(frame.rgb_path)
    nocs_img = load_nocs_png(frame.nocs_path)
    depth, campose = load_depth_campose(frame.hdf5_path)
    h, w = img.shape[:2]

    pad_img = np.zeros((cfg.pad_height, cfg.pad_width, 3), np.float32)
    pad_img[:h, :w] = img

    out = DetectionSample(
        image=pad_img, depth=depth, campose=campose,
        boxes=np.zeros((M, 4), np.float32),
        classes=np.zeros((M,), np.int32),
        valid=np.zeros((M,), bool),
        masks=np.zeros((M, cfg.pad_height, cfg.pad_width), np.float32),
        voxels=np.zeros((M, 32, 32, 32), np.float32),
        nocs=np.zeros((M, nocs_patch_size, nocs_patch_size, 3), np.float32),
        boxes3d=np.zeros((M, 8, 3), np.float32),
        object_ids=np.full((M,), -1, np.int32),
        locations=np.zeros((M, 3), np.float32),
        rotations=np.zeros((M, 3), np.float32),
        scales3d=np.ones((M,), np.float32),
    )
    for i, a in enumerate(frame.annotations[:M]):
        x, y, bw, bh = a.box_xywh
        box = np.array([x, y, x + bw, y + bh], np.float32)
        mask = polygons_to_mask(a.segmentation, h, w)
        patch = crop_normalise_nocs(nocs_img, mask, box)
        out.boxes[i] = box
        out.classes[i] = a.category
        out.valid[i] = True
        out.masks[i, :h, :w] = mask
        if load_voxels and ds.voxel_dir:
            out.voxels[i] = ds.load_voxel(a.jid, a.scale3d)
        out.nocs[i] = _resize_patch(patch, nocs_patch_size)
        # Canonical corner order: box3d_iou reads corners BY INDEX (the
        # reference sorts GT boxes at crop time, run_crop_3dbbox); raw
        # dataset corner order breaks every downstream pred-vs-GT 3D IoU.
        from mot3d_tpu.geometry.transforms import sort_bbox_np
        out.boxes3d[i] = sort_bbox_np(a.box3d)
        out.object_ids[i] = a.object_id
        out.locations[i] = a.location3d
        out.rotations[i] = a.rotation3d
        out.scales3d[i] = float(np.asarray(a.scale3d).max())
    return out


def stack_samples(samples: List[DetectionSample]) -> DetectionSample:
    return DetectionSample(*[np.stack([getattr(s, f) for s in samples])
                             for f in DetectionSample._fields])


def compact_sample(s: DetectionSample) -> DetectionSample:
    """Narrow the heavy fields for the host->device hop: uint8 image, bool
    masks/voxels.  A full-res f32 batch is ~14 MB vs ~3 MB compact, and the
    axon tunnel's H2D bandwidth made the f32 form the training loop's
    bottleneck (round-5 steady-state study: ~360 ms/step loop vs 53 ms
    device step).  The jit step widens back to f32 on device
    (DetectionTrainer._make_step / parallel/train_step.py)."""
    return s._replace(image=s.image.astype(np.uint8),
                      masks=s.masks.astype(bool),
                      voxels=s.voxels.astype(bool))


def iterate_detection_batches(ds: MOTFrontDataset, cfg: DetectionConfig,
                              batch_size: int, shuffle: bool = True,
                              seed: int = 0, epochs: int = 1,
                              prefetch: int = 2,
                              cache_samples: int = 0
                              ) -> Iterator[DetectionSample]:
    """Background-thread prefetched batch iterator over all frames.

    cache_samples > 0 keeps up to that many loaded frames in memory so
    later epochs skip png/hdf5/binvox decoding entirely (the reference's
    DataLoader with NUM_WORKERS=0 re-decodes every epoch,
    `Detection/cfg_setup.py:45`); size it to the dataset for small runs,
    leave 0 for datasets larger than RAM.
    """
    scenes = ds.scenes()
    index = [(s, t) for s in scenes
             for t in range(len(ds.load_scene(s).frames))]
    rng = np.random.default_rng(seed)
    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = object()
    cache: dict = {}

    def load(k):
        if k in cache:
            return cache[k]
        scene, t = index[k]
        sample = load_frame(ds, ds.load_scene(scene).frames[t], cfg)
        if len(cache) < cache_samples:
            cache[k] = sample
        return sample

    def worker():
        for _ in range(epochs):
            order = rng.permutation(len(index)) if shuffle else range(len(index))
            batch: List[DetectionSample] = []
            for k in order:
                batch.append(load(int(k)))
                if len(batch) == batch_size:
                    q.put(stack_samples(batch))
                    batch = []
        q.put(stop)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is stop:
            return
        yield item
