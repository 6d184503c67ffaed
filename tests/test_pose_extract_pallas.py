"""Pallas fused pose-extraction kernel vs the XLA grid_extract formulation
(interpret mode on CPU; the real-TPU lowering is exercised by bench.py and
examples/drive_pose.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mot3d_tpu.ops.pallas.pose_extract import pose_extract_pallas
from mot3d_tpu.pose.extraction import grid_extract


def _frame(d_count=4, h=64, w=64, seed=0):
    rng = np.random.default_rng(seed)
    depth = rng.uniform(1.5, 3.0, (h, w)).astype(np.float32)
    depth[rng.uniform(size=(h, w)) < 0.1] = 0.0  # holes
    boxes = []
    for _ in range(d_count):
        x0 = rng.uniform(0, w - 12)
        y0 = rng.uniform(0, h - 12)
        boxes.append([x0, y0, x0 + rng.uniform(8, w - x0),
                      y0 + rng.uniform(8, h - y0)])
    boxes = np.asarray(boxes, np.float32)
    nocs = rng.uniform(0, 1, (d_count, 28, 28, 3)).astype(np.float32)
    masks = (rng.uniform(size=(d_count, 28, 28)) > 0.3).astype(np.float32)
    intr = np.array([[64.0, 0, 31.5], [0, 64.0, 31.5], [0, 0, 1]],
                    np.float32)
    return nocs, masks, boxes, depth, intr


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_grid_extract(seed):
    nocs, masks, boxes, depth, intr = _frame(seed=seed)
    feats_p, valid_p = pose_extract_pallas(
        jnp.asarray(nocs), jnp.asarray(masks), jnp.asarray(boxes),
        jnp.asarray(depth), jnp.asarray(intr), grid=32, interpret=True)
    feats_x, valid_x = jax.vmap(
        lambda n, m, b: grid_extract(n, m, b, jnp.asarray(depth),
                                     jnp.asarray(intr), grid=32))(
        jnp.asarray(nocs), jnp.asarray(masks), jnp.asarray(boxes))
    np.testing.assert_array_equal(np.asarray(valid_p), np.asarray(valid_x))
    np.testing.assert_allclose(np.asarray(feats_p), np.asarray(feats_x),
                               atol=2e-5)


def test_boxes_partially_outside_image():
    nocs, masks, boxes, depth, intr = _frame(d_count=2)
    boxes[0] = [-10.0, -10.0, 30.0, 30.0]
    boxes[1] = [40.0, 40.0, 90.0, 90.0]
    feats_p, valid_p = pose_extract_pallas(
        jnp.asarray(nocs), jnp.asarray(masks), jnp.asarray(boxes),
        jnp.asarray(depth), jnp.asarray(intr), grid=32, interpret=True)
    feats_x, valid_x = jax.vmap(
        lambda n, m, b: grid_extract(n, m, b, jnp.asarray(depth),
                                     jnp.asarray(intr), grid=32))(
        jnp.asarray(nocs), jnp.asarray(masks), jnp.asarray(boxes))
    np.testing.assert_array_equal(np.asarray(valid_p), np.asarray(valid_x))
    np.testing.assert_allclose(np.asarray(feats_p), np.asarray(feats_x),
                               atol=2e-5)
    assert np.isfinite(np.asarray(feats_p)).all()
