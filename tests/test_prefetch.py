"""Device prefetch + sample caching (the fused input pipeline pieces)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mot3d_tpu.data.prefetch import device_prefetch
from mot3d_tpu.parallel.mesh import make_mesh


def test_device_prefetch_order_and_placement():
    batches = [{"x": np.full((4, 3), i, np.float32), "i": np.int32(i)}
               for i in range(5)]
    out = list(device_prefetch(iter(batches), buffer_size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert isinstance(b["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])
        assert int(b["i"]) == i


def test_device_prefetch_sharded():
    mesh = make_mesh(8)
    sharding = NamedSharding(mesh, P("data"))
    batches = [np.arange(16, dtype=np.float32).reshape(8, 2)
               for _ in range(3)]
    out = list(device_prefetch(iter(batches), sharding=sharding))
    for b in out:
        assert b.sharding == sharding
        # consumable by a jitted reduction without resharding
        assert float(jnp.sum(b)) == float(np.sum(batches[0]))


def test_cache_samples_skips_reload(tmp_path, monkeypatch):
    from mot3d_tpu.config import CameraConfig, DetectionConfig
    from mot3d_tpu.data import detection_loader
    from mot3d_tpu.data.detection_loader import iterate_detection_batches
    from mot3d_tpu.data.fixtures import write_motfront_fixture
    from mot3d_tpu.data.motfront import MOTFrontDataset

    cam = CameraConfig(height=64, width=64, fx=64.0, fy=64.0)
    root = str(tmp_path / "mf")
    write_motfront_fixture(root, "train", num_scenes=1, num_frames=4,
                           num_objects=1, seed=0, cam=cam)
    det = DetectionConfig(pad_height=64, pad_width=64, image_height=64,
                          image_width=64, max_instances=2)
    ds = MOTFrontDataset(root, "train", voxel_dir=root + "/voxels")

    calls = {"n": 0}
    real = detection_loader.load_frame

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(detection_loader, "load_frame", counting)
    n = sum(1 for _ in iterate_detection_batches(
        ds, det, batch_size=2, epochs=3, cache_samples=16, shuffle=False))
    assert n == 6  # 4 frames / bs 2 x 3 epochs
    assert calls["n"] == 4  # each frame decoded exactly once

    calls["n"] = 0
    list(iterate_detection_batches(ds, det, batch_size=2, epochs=2,
                                   cache_samples=0, shuffle=False))
    assert calls["n"] == 8  # no cache: re-decoded every epoch
